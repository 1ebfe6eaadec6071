from . import attention, conv, dsp, quant_matmul, rnn, sampling  # noqa: F401
from .quant_matmul import QuantTensor  # noqa: F401
