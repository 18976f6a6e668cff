from .cosmology import Cosmology
from .base import (APEffect, BaseTheoryPowerSpectrumMultipoles, BaseTheoryCorrelationFunctionMultipoles,
                   BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles, ap_k_mu, ap_s_mu)
from .power_template import (BasePowerSpectrumTemplate, FixedPowerSpectrumTemplate, BAOPowerSpectrumTemplate,
                             BAOPhaseShiftPowerSpectrumTemplate, StandardPowerSpectrumTemplate,
                             ShapeFitPowerSpectrumTemplate, DirectPowerSpectrumTemplate, DirectWiggleSplitPowerSpectrumTemplate,
                             WiggleSplitPowerSpectrumTemplate, BandVelocityPowerSpectrumTemplate,
                             TurnOverPowerSpectrumTemplate, ExtractedBandVelocityPowerSpectrumTemplate,
                             BandVelocityPowerSpectrumCalculator)
from .bao import (BaseBAOWigglesPowerSpectrumMultipoles, BaseBAOWigglesTracerPowerSpectrumMultipoles,
                  BaseBAOWigglesCorrelationFunctionMultipoles, BaseBAOWigglesTracerCorrelationFunctionMultipoles,
                  DampedBAOWigglesPowerSpectrumMultipoles, SimpleBAOWigglesPowerSpectrumMultipoles,
                  ResummedBAOWigglesPowerSpectrumMultipoles, FlexibleBAOWigglesPowerSpectrumMultipoles,
                  DampedBAOWigglesTracerPowerSpectrumMultipoles, SimpleBAOWigglesTracerPowerSpectrumMultipoles,
                  ResummedBAOWigglesTracerPowerSpectrumMultipoles, FlexibleBAOWigglesTracerPowerSpectrumMultipoles,
                  DampedBAOWigglesTracerCorrelationFunctionMultipoles, SimpleBAOWigglesTracerCorrelationFunctionMultipoles,
                  ResummedBAOWigglesTracerCorrelationFunctionMultipoles, FlexibleBAOWigglesTracerCorrelationFunctionMultipoles,
                  DampedBAOWigglesCorrelationFunctionMultipoles, SimpleBAOWigglesCorrelationFunctionMultipoles,
                  ResummedBAOWigglesCorrelationFunctionMultipoles, FlexibleBAOWigglesCorrelationFunctionMultipoles)
from .full_shape import (BasePTPowerSpectrumMultipoles, BaseTracerPowerSpectrumMultipoles,
                         BaseTracerCorrelationFunctionMultipoles,
                         KaiserPowerSpectrumMultipoles, KaiserTracerPowerSpectrumMultipoles,
                         EFTLikeKaiserTracerPowerSpectrumMultipoles, KaiserTracerCorrelationFunctionMultipoles,
                         EFTLikeKaiserTracerCorrelationFunctionMultipoles, SimpleTracerPowerSpectrumMultipoles)
from .ept import EPTTracerPowerSpectrumMultipoles, EPTTracerCorrelationFunctionMultipoles
from .tns import (TNSTracerPowerSpectrumMultipoles, EFTLikeTNSTracerPowerSpectrumMultipoles,
                  TNSTracerCorrelationFunctionMultipoles, EFTLikeTNSTracerCorrelationFunctionMultipoles)
from .extractors import (BAOExtractor, StandardPowerSpectrumExtractor, ShapeFitPowerSpectrumExtractor,
                         WiggleSplitPowerSpectrumExtractor, BandVelocityPowerSpectrumExtractor,
                         TurnOverPowerSpectrumExtractor, BAOPhaseShiftExtractor)
from .png import PNGTracerPowerSpectrumMultipoles, PNGTracerVelocityPowerSpectrumMultipoles
from .bispectrum import TreeLevelBispectrumMultipoles
from .lya import P1DPowerSpectrumExtractor
from .weak_lensing import DESY3Theory, DES_Y3_PARAM_MAP

# reference-name compatibility aliases (PEP 562 lazy to avoid import cycles)
_COMPAT_NAMES = ('FOLPSTracerPowerSpectrumMultipoles', 'FOLPSAXTracerPowerSpectrumMultipoles',
                 'LPTVelocileptorsTracerPowerSpectrumMultipoles', 'REPTVelocileptorsTracerPowerSpectrumMultipoles',
                 'PyBirdTracerPowerSpectrumMultipoles', 'FOLPSTracerCorrelationFunctionMultipoles',
                 'FOLPSAXTracerCorrelationFunctionMultipoles', 'LPTVelocileptorsTracerCorrelationFunctionMultipoles',
                 'REPTVelocileptorsTracerCorrelationFunctionMultipoles', 'PyBirdTracerCorrelationFunctionMultipoles',
                 'GeoFPTAXTracerBispectrumMultipoles', 'JAXEffortTracerPowerSpectrumMultipoles', 'Cosmoprimo')


def __getattr__(name):
    if name in _COMPAT_NAMES:
        from .. import compat
        return getattr(compat, name)
    raise AttributeError('module {!r} has no attribute {!r}'.format(__name__, name))
