from cgs_tpu.core.config import Config, build_arg_parser, parse_args  # noqa: F401
