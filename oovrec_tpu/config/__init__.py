from oovrec_tpu.config.configurator import Config, parse_cli_args

__all__ = ["Config", "parse_cli_args"]
