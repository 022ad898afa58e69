__version__ = "0.2.0"
__version_tuple__ = (0, 2, 0)
