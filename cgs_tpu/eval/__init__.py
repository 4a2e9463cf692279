from cgs_tpu.eval.harness import evaluate, load_eval_set  # noqa: F401
from cgs_tpu.eval.segment import segment_folder  # noqa: F401
