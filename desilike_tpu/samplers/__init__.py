from .base import BasePosteriorSampler
from .ensemble import EnsembleSampler, EnsembleSliceSampler
from .mcmc import MCMCSampler
from .nuts import NUTSSampler
from .deterministic import GridSampler, QMCSampler, ImportanceSampler
from .hmc import HMCSampler, MCLMCSampler
from .nested import NestedSampler
from .chees import ChEESSampler
