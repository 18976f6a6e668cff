from .chain import Chain
from .profiles import (Profiles, ParameterBestFit, ParameterProfiles,
                       ParameterGrid, ParameterContours)
from . import diagnostics
from . import plotting
from ..interop import (load_source, is_path,  # noqa: F401  (uniform loaders)
                       get_params_in_source)
from ..parameters import Samples  # noqa: F401  (reference samples.Samples)
from ..parameters.covariance import ParameterCovariance, ParameterPrecision  # noqa: F401
from ..utils import BaseClass  # noqa: F401  (ref samples/__init__.py re-export)
from .. import utils  # noqa: F401  (ref `from desilike.samples import utils`)
