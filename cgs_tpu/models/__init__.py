from cgs_tpu.models.critic import Critic  # noqa: F401
from cgs_tpu.models.decoder import UnetDecoder, upsample2x  # noqa: F401
