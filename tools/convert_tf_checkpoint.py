"""Compatibility shim: the converter lives in :mod:`densereg_tpu.convert`.

Kept so the documented ``python tools/convert_tf_checkpoint.py ...`` command
line keeps working.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from densereg_tpu.convert import (  # noqa: F401  (re-exported API)
    convert,
    hourglass_convs,
    load_converted,
    main,
    model_conv_order,
    residual_convs,
    save_converted,
    tf_conv_scopes,
)

if __name__ == "__main__":
    main()
