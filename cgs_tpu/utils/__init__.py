from cgs_tpu.utils.artifacts import (  # noqa: F401
    annotate_strip, moving_average, save_histogram, save_loss_plot,
)
from cgs_tpu.utils.video import vidwrite  # noqa: F401
