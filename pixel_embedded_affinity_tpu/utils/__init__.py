from .seed import setup_seed
from .ema import update_ema_variables, sigmoid_rampup, linear_rampup, cosine_rampdown
from .profiling import ThroughputMeter, trace_context
