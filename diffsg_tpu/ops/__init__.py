from .objectives import msr_sum_rate, co_cost, nu_rate, nu_channel_gains
from .decoders import msr_decode, co_decode, nu_decode
from .debug_eval import step_cost_calc, step_sum_rate
from . import losses
