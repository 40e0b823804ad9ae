"""Evaluation: CD / EMD / F-score over datasets."""
from pcfm.eval.metrics import aggregate, cloud_metrics

__all__ = ["aggregate", "cloud_metrics"]
