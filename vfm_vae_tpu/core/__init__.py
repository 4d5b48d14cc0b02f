from .config import EasyDict, load_config, derive_config, recursive_easydict
from .registry import register, construct_class_by_name, get_class_by_name
from .logging import Logger, format_time, print0
