from cgs_tpu.data.collect import collect_data, trunk_filter, begin_filter  # noqa: F401
from cgs_tpu.data.synthetic import synthetic_dataset, synthetic_eval_set  # noqa: F401
from cgs_tpu.data.loader import DataBundle, EpochLoader  # noqa: F401
