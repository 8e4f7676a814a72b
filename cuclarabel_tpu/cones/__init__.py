from .api import (
    SupportedCone,
    ZeroConeT,
    NonnegativeConeT,
    SecondOrderConeT,
    ExponentialConeT,
    PowerConeT,
    GenPowerConeT,
    PSDTriangleConeT,
    nvars,
    cones_collapsed,
)
from .layout import ConeLayout
