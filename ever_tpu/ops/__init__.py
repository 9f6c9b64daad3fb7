from ever_tpu.ops import attention, quant
from ever_tpu.ops.quant import QuantDense, int8_matmul, quantize_int8

# the FUNCTION is the public surface (`from ever_tpu.ops import attention`);
# the submodule stays importable as ever_tpu.ops.attention via sys.modules
from ever_tpu.ops.attention import attention as attention  # noqa: F811
attention_fn = attention
