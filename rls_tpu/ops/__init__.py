from .base import (
    DenseOperator,
    SamplingOperator,
    IdentityOperator,
    LinearOperator,
    NormalOperator,
    ProdOperator,
    StackedOperator,
    WeightingOperator,
    adjoint_operator,
    as_operator,
)
from .conv_direct import DirectConvOperator, SeparableConvOperator
from .dft_real import SenseDFT2RealOperator, SubsampledDFT2RealOperator
from .function_op import FunctionOperator
from .fourier import ConvolutionOperator, FFTOperator, SubsampledFFTOperator
from .grad import Grad8Operator, GradientOperator
from .radon import RadonOperator
from .sparse import PaddedCSROperator, SparseOperator
from .wavelet import WaveletOperator, max_wavelet_levels

__all__ = [
    "LinearOperator",
    "DenseOperator",
    "IdentityOperator",
    "WeightingOperator",
    "ProdOperator",
    "NormalOperator",
    "StackedOperator",
    "SamplingOperator",
    "PaddedCSROperator",
    "SparseOperator",
    "GradientOperator",
    "Grad8Operator",
    "FFTOperator",
    "SubsampledFFTOperator",
    "ConvolutionOperator",
    "DirectConvOperator",
    "SeparableConvOperator",
    "SubsampledDFT2RealOperator",
    "SenseDFT2RealOperator",
    "FunctionOperator",
    "RadonOperator",
    "WaveletOperator",
    "max_wavelet_levels",
    "as_operator",
    "adjoint_operator",
]
