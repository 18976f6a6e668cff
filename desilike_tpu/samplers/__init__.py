from .base import BasePosteriorSampler
from .ensemble import EnsembleSampler
from .mcmc import MCMCSampler
