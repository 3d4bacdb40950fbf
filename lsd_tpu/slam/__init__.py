from .state import NavState, ERR_DIM, boxplus, boxminus, init_state
from .lio import LioConfig, LioState, lio_init, lio_step
