"""CMB likelihood family (counterpart of reference likelihoods/cmb/)."""

from .base import ClTheory, synthetic_cl_tables
from .planck2018 import (TTTEEEHighlPlanck2018LiteLikelihood, TTHighlPlanck2018LiteLikelihood,
                         TTLowlPlanck2018Likelihood, EELowlPlanck2018Likelihood)
from .planck2018_gaussian import (BasePlanck2018GaussianLikelihood, Planck2018GaussianLikelihood,
                                  read_getdist_covmat, read_getdist_margestats,
                                  convert_planck2018_params)
from .lollipop import (LollipopLikelihood, EELowlPlanck2020LollipopLikelihood,
                       BBLowlPlanck2020LollipopLikelihood, EBLowlPlanck2020LollipopLikelihood)
from .act_dr6_lensing import ACTDR6LensingLikelihood
from .hillipop import (BaseHillipopLikelihood, TTTEEEHighlPlanck2020HillipopLikelihood,
                       TTHighlPlanck2020HillipopLikelihood, EEHighlPlanck2020HillipopLikelihood,
                       TEHighlPlanck2020HillipopLikelihood)
from .camspec import (BasePlanckNPIPECamspecLikelihood,
                      TTTEEEHighlPlanckNPIPECamspecLikelihood,
                      TTHighlPlanckNPIPECamspecLikelihood,
                      synthetic_camspec_data)
