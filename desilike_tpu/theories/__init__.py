from .cosmology import Cosmology
from .base import (APEffect, BaseTheoryPowerSpectrumMultipoles, BaseTheoryCorrelationFunctionMultipoles,
                   BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles, ap_k_mu, ap_s_mu)
from .power_template import (BasePowerSpectrumTemplate, FixedPowerSpectrumTemplate, BAOPowerSpectrumTemplate,
                             StandardPowerSpectrumTemplate, ShapeFitPowerSpectrumTemplate, DirectPowerSpectrumTemplate)
from .bao import (DampedBAOWigglesPowerSpectrumMultipoles, SimpleBAOWigglesPowerSpectrumMultipoles,
                  ResummedBAOWigglesPowerSpectrumMultipoles, FlexibleBAOWigglesPowerSpectrumMultipoles,
                  DampedBAOWigglesTracerPowerSpectrumMultipoles, SimpleBAOWigglesTracerPowerSpectrumMultipoles,
                  ResummedBAOWigglesTracerPowerSpectrumMultipoles, FlexibleBAOWigglesTracerPowerSpectrumMultipoles,
                  DampedBAOWigglesTracerCorrelationFunctionMultipoles, SimpleBAOWigglesTracerCorrelationFunctionMultipoles,
                  ResummedBAOWigglesTracerCorrelationFunctionMultipoles)
from .extractors import BAOExtractor, StandardPowerSpectrumExtractor, ShapeFitPowerSpectrumExtractor
from .full_shape import (KaiserPowerSpectrumMultipoles, KaiserTracerPowerSpectrumMultipoles,
                         EFTLikeKaiserTracerPowerSpectrumMultipoles,
                         KaiserTracerCorrelationFunctionMultipoles,
                         EFTLikeKaiserTracerCorrelationFunctionMultipoles)
from .ept import EPTTracerPowerSpectrumMultipoles, EPTTracerCorrelationFunctionMultipoles
from .png import PNGTracerPowerSpectrumMultipoles
from .bispectrum import TreeLevelBispectrumMultipoles
from .power_template import (WiggleSplitPowerSpectrumTemplate, BandVelocityPowerSpectrumTemplate,
                             TurnOverPowerSpectrumTemplate)
from .lya import P1DPowerSpectrumExtractor
from .full_shape import SimpleTracerPowerSpectrumMultipoles
from .power_template import BAOPhaseShiftPowerSpectrumTemplate
