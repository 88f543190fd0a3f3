from .mppi import MPPI, MPPIConfig, MPPIState
from .cem import CEM, CEMConfig, CEMState
from .ilqr import ILQR, ILQRConfig
from .mpc import CEMILQR, CEMILQRConfig, solve_task
