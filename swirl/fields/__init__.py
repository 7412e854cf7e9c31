from . import babybear, ext

__all__ = ["babybear", "ext"]
