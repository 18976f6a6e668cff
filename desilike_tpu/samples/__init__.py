from .chain import Chain
from .profiles import Profiles
from . import diagnostics
from . import plotting
