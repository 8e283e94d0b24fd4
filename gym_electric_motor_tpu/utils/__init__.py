from .pytree import static_field, struct
from .params import update_parameter_dict, set_state_array
from . import profiling

__all__ = ["struct", "static_field", "update_parameter_dict",
           "set_state_array", "profiling"]
