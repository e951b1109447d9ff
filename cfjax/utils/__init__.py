from .besselk import besselk, besselkxv
from .grids import LazyGrid, UniformGrid, as_points, detect_uniform_grid
from .linalg import (
    exchange_matrix,
    givens_rotation,
    jet_derivatives,
    leave_one_out_products,
    nth_derivatives,
    perfect_shuffle,
    perfect_shuffle_indices,
)
from .testing import (
    iscov,
    isisotropic_probe,
    ispsd,
    isstationary_probe,
    pairwise,
    pairwise_xy,
)
