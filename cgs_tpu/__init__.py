"""cgs_tpu — TPU-native critic-guided segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
`ndrwmlnk/critic-guided-segmentation-of-rewarding-objects-in-first-person-views`
(GCAI 2021, arXiv:2107.09540): learning pixel-level masks of rewarding
objects from sparse rewards only, with a reward-critic CNN and a U-Net
style masker trained by counterfactual mask injection.

Design notes (TPU-first, not a port):
  * all device math is jitted, NHWC, static shapes;
  * training steps are single fused XLA programs (3 critic passes +
    masker + losses + optax update);
  * data parallelism via `jax.sharding.Mesh` + NamedSharding, grads
    all-reduced by XLA over ICI;
  * hot elementwise paths (mask merge, threshold+IoU, uint8 ingest)
    have Pallas TPU kernels in `cgs_tpu.ops.pallas_kernels`;
  * the one genuinely native dependency of the reference (pydensecrf)
    is re-implemented as a first-party C++ extension in `native/densecrf`.

Reference parity citations use `main.py:LINE` / `nets.py:LINE` of the
upstream repo throughout the source tree.
"""

__version__ = "0.1.0"

from cgs_tpu.core.config import Config, build_arg_parser, parse_args  # noqa: F401
from cgs_tpu.models.critic import Critic  # noqa: F401
from cgs_tpu.models.decoder import UnetDecoder  # noqa: F401
