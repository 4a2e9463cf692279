from cgs_tpu.ops.merge import replace_merge, inject_merge  # noqa: F401
from cgs_tpu.ops.discount import discount_rewards, build_label_matrix  # noqa: F401
from cgs_tpu.ops.augment import shift_batch  # noqa: F401
from cgs_tpu.ops.iou import iou, iou_counts  # noqa: F401
from cgs_tpu.ops.saliency import (  # noqa: F401
    saliency_map, normalize_saliency_global, normalize_saliency_topk,
)
