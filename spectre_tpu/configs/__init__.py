from spectre_tpu.configs.parser import config_to_dict, module_to_dict, parse_config

__all__ = ["parse_config", "module_to_dict", "config_to_dict"]
