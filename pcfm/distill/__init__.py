from pcfm.distill.progressive import (DistillState, distill_pf,
                                      make_distill_step)

__all__ = ["DistillState", "distill_pf", "make_distill_step"]
