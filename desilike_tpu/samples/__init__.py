from .chain import Chain
from .profiles import Profiles
from . import diagnostics
from . import plotting
from ..interop import load_source  # noqa: F401  (uniform chain/profiles loader)
from ..parameters import Samples  # noqa: F401  (reference samples.Samples)
from ..parameters.covariance import ParameterCovariance  # noqa: F401

# reference container names: the best-fit rows ARE a Samples collection here
ParameterBestFit = Samples
