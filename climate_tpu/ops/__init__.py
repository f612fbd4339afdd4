from .attention import dot_product_attention  # noqa: F401
from .convlstm_cell import convlstm_gates  # noqa: F401
