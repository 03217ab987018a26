from .macros import payment_type_description, surrogate_key  # noqa: F401
from .parity import dsum, davg  # noqa: F401
