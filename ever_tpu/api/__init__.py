from ever_tpu.api import infer_tool
