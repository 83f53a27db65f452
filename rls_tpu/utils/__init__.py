from .misc import enf_pos, enf_real, im2col_distinct, col2im_distinct, nrmsd
from .power_iterations import power_iterations

__all__ = [
    "power_iterations",
    "nrmsd",
    "enf_real",
    "enf_pos",
    "im2col_distinct",
    "col2im_distinct",
]
