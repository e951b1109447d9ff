from .gradient import (
    GradientGramian,
    GradientKernel,
    ValueGradientGramian,
    ValueGradientKernel,
)
from .hessian import (
    HessianGramian,
    HessianKernel,
    ValueGradientHessianGramian,
    ValueGradientHessianKernel,
)
from .separable import SeparableKernel
