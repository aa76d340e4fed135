"""Numpy-safe JSON encoding (reference ``merge_machine/my_json_encoder.py:13-26``
role): learner state carries numpy scalars/arrays; checkpoints must
round-trip through plain JSON."""

from __future__ import annotations

import json

import numpy as np


class NumpySafeEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        if isinstance(o, np.bool_):
            return bool(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)
