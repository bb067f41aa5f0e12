from .cache import cached_eval_basis, cached_graph, clear_cache
from .checkpoint import (
    load_params,
    load_training_state,
    save_params,
    save_training_state,
)
from .datasets import (
    manifold_1D_dataset,
    manifold_2D_dataset,
    parse_msh,
    parse_stl,
    rmnist_dataset,
    rotate_mnist,
)
from .evaluate import gaussian_nll, test_model
from .metrics import MetricsRecorder, phase_timer, profile_trace
from .multistart import multi_start_train, random_restarts
from .sampling import grid_uniform, sample_posterior
from .train import ReduceLROnPlateau, manifold_informed_train, vanilla_train

__all__ = [
    "cached_eval_basis",
    "cached_graph",
    "clear_cache",
    "MetricsRecorder",
    "phase_timer",
    "profile_trace",
    "grid_uniform",
    "sample_posterior",
    "multi_start_train",
    "random_restarts",
    "load_params",
    "save_params",
    "load_training_state",
    "save_training_state",
    "manifold_1D_dataset",
    "manifold_2D_dataset",
    "parse_msh",
    "parse_stl",
    "rmnist_dataset",
    "rotate_mnist",
    "gaussian_nll",
    "test_model",
    "ReduceLROnPlateau",
    "manifold_informed_train",
    "vanilla_train",
]
