"""Native (C++) host-runtime components, loaded through ctypes.

The TPU compute path is JAX/XLA/Pallas; these cover the host side the
reference delegates to native code (its torch DataLoader workers + vendored
C++): fast ASCII PLY parsing and threaded subsample-gather for the input
pipeline.  Everything degrades gracefully to numpy when a compiler is
unavailable.
"""
from pcfm.native.build import get_lib, parse_ascii_rows, subsample_gather

__all__ = ["get_lib", "parse_ascii_rows", "subsample_gather"]
