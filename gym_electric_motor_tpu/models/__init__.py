from . import motors, converters, loads, supplies

__all__ = ["motors", "converters", "loads", "supplies"]
