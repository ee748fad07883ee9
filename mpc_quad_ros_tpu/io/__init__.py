from .logger import Logger, save_dict, load_dict
from .config import SimConfig

__all__ = ["Logger", "save_dict", "load_dict", "SimConfig"]
