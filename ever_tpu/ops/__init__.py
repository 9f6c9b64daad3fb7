from ever_tpu.ops import attention, quant
from ever_tpu.ops.attention import attention as attention_fn
from ever_tpu.ops.quant import QuantDense, int8_matmul, quantize_int8
