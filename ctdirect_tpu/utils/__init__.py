from ctdirect_tpu.utils.options import OptionDef, OptionSet, OptionError

__all__ = ["OptionDef", "OptionSet", "OptionError"]
