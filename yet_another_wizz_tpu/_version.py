__version__ = "0.3.1"
__version_tuple__ = (0, 3, 1)
