"""Baseline configurations (BASELINE.json configs 1-5)."""
from configs.tiny_synthetic import config as tiny_synthetic
from configs.scissors_2048 import config as scissors_2048
from configs.rgb_10k import config as rgb_10k
from configs.full_20k_rgb import config as full_20k_rgb
from configs.multicat_dp8 import config as multicat_dp8

__all__ = ["tiny_synthetic", "scissors_2048", "rgb_10k", "full_20k_rgb",
           "multicat_dp8"]
