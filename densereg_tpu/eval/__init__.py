from densereg_tpu.eval.metrics import (
    max_joint_error,
    mean_joint_error,
    threshold_curve,
    summarize_percentages,
)
from densereg_tpu.eval.writer import ResultWriter, write_error_curve
from densereg_tpu.eval.loop import make_infer_fn, evaluate_stream

__all__ = [
    "max_joint_error",
    "mean_joint_error",
    "threshold_curve",
    "summarize_percentages",
    "ResultWriter",
    "write_error_curve",
    "make_infer_fn",
    "evaluate_stream",
]
