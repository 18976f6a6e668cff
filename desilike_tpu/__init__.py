"""desilike_tpu: TPU-native cosmological inference framework.

A from-scratch JAX/XLA rebuild of the capabilities of cosmodesi/desilike
(see SURVEY.md at the repository root): calculator graphs compiled to single
XLA programs, Chebyshev spectral tables instead of gather-based
interpolation, fused analytic marginalization, in-framework samplers running
thousands of vmapped chains per chip, and mesh sharding in place of MPI.
"""

__version__ = '0.1.0'

from .config import set_dtype, get_dtype
from .utils import setup_logging, BaseClass
from .parameters import Parameter, ParameterCollection, Prior, Samples, Deriv
from .core import Calculator, Pipeline
from .core.collection import CollectionCalculator, vmap
from .differentiation import Differentiation
from .fisher import Fisher, LikelihoodFisher
from .likelihoods.base import FisherGaussianLikelihood
from .parameters import ParameterCovariance, ParameterPrecision
from .io import BaseConfig, from_config
from .install import Installer
from .samples.chain import Chain
from .samples.profiles import Profiles

# reference top-level aliases (ref desilike/__init__.py re-exports)
BaseCalculator = Calculator
ParameterPrior = Prior
from .parameters.samples import DerivArray as ParameterArray  # noqa: E402
PipelineError = RuntimeError  # pipeline errors raise RuntimeError natively
from . import plotting, utils  # noqa: E402  — `from desilike import plotting, utils` idiom
