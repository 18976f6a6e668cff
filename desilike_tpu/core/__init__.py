from .calculator import Calculator, InitConfig, RuntimeInfo
from .pipeline import Pipeline
