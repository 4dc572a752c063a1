from .navstate import NavState, navstate_identity, inc_small, inc_small_pvr, inc_small_pr, inc_small_bias
from .preintegration import (
    IMUNoise,
    PreintState,
    preint_identity,
    preintegrate,
    preint_update,
    predict_navstate,
)
