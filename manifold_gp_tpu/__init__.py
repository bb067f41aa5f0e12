"""manifold_gp_tpu — TPU-native implicit-manifold Gaussian process regression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference implementation of Implicit Manifold Gaussian Process Regression
(nash169/manifold-gp): graph-Laplacian Matérn GPs on implicit manifolds with
precision-form hyperparameter training (CG + stochastic Lanczos quadrature),
spectral-feature prediction with a Nystrom out-of-sample extension, and
hybrid geometric/Euclidean posteriors — plus the iterative-inference engine,
multi-chip sharding, and TPU kernels the reference outsources to
GPyTorch/FAISS/CUDA.
"""

from .config import DEFAULT_CONFIG, InferenceConfig
from .kernels import MaternKernel, RBFKernel, RiemannKernel, RiemannMaternKernel
from .models import Posterior, RiemannGP, VanillaGP
from .parameters import GreaterThan, Interval, Positive
from .priors import GammaPrior, InverseGammaPrior, NormalPrior

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_CONFIG",
    "InferenceConfig",
    "MaternKernel",
    "RBFKernel",
    "RiemannKernel",
    "RiemannMaternKernel",
    "Posterior",
    "RiemannGP",
    "VanillaGP",
    "GreaterThan",
    "Interval",
    "Positive",
    "GammaPrior",
    "InverseGammaPrior",
    "NormalPrior",
]
