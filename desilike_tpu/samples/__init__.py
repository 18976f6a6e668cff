from .chain import Chain
from . import diagnostics
