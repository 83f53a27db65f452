"""rls_tpu — TPU-native regularized least-squares solver suite.

From-scratch JAX/XLA/Pallas framework with the capabilities of
RegularizedLeastSquares.jl (reference mounted read-only at /root/reference).
"""

from . import ops, utils
from .models import prox, regularization
from .models.prox import (
    L1Regularization,
    L2Regularization,
    L21Regularization,
    LLRRegularization,
    NuclearRegularization,
    PositiveRegularization,
    ProjectionRegularizationTerm,
    RealRegularization,
    TVRegularization,
)
from .models.regularization import (
    AutoScaledRegularization,
    FixedParameterRegularization,
    FixedScaledRegularization,
    MaskedRegularization,
    MeasurementBasedNormalization,
    NoNormalization,
    NormalizedRegularization,
    PlugAndPlayRegularization,
    PnPRegularization,
    SystemMatrixBasedNormalization,
    TransformedRegularization,
)
from .models.solvers import (
    CGNR,
    FISTA,
    solve,
    solve_batched,
    solve_trace,
    solve_with_callbacks,
)
from .ops import (
    ConvolutionOperator,
    DenseOperator,
    FFTOperator,
    GradientOperator,
    IdentityOperator,
    NormalOperator,
    ProdOperator,
    SparseOperator,
    StackedOperator,
    SubsampledFFTOperator,
    WeightingOperator,
)
from .utils import nrmsd, power_iterations

__version__ = "0.1.0"
