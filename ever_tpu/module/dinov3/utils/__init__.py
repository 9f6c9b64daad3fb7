"""Path-parity package: ``ever.module.dinov3.utils`` (reference
``ever/module/dinov3/utils/__init__.py``)."""

from ever_tpu.module.dinov3.utils.utils import (cat_keep_shapes,
                                                count_parameters,
                                                fix_random_seeds,
                                                get_conda_env, get_sha,
                                                has_batchnorms, named_apply,
                                                named_replace,
                                                uncat_with_shapes)
