from ever_tpu.ops import attention, ptq, quant
from ever_tpu.ops.ptq import (calibrate_int8, make_ptq_predict_fn, ptq_apply,
                              ptq_quantize, quantize_convs)
from ever_tpu.ops.quant import QuantDense, int8_matmul, quantize_int8

# the FUNCTION is the public surface (`from ever_tpu.ops import attention`);
# the submodule stays importable as ever_tpu.ops.attention via sys.modules
from ever_tpu.ops.attention import attention as attention  # noqa: F811
attention_fn = attention
