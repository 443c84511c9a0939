"""One atomic-JSON-sidecar publish recipe, shared.

Sidecar metadata (index layout/health in ``_ivf_meta.json``, the
CDF-sync watermark in ``_index_sync.json``) is rewritten by live
maintenance loops while readers hold the path — a truncating
``open("w")`` exposes torn/empty JSON, and a FIXED shared tmp name lets
two concurrent writers interleave into one file and publish the tear
via ``os.replace``. The recipe: per-writer-unique tmp (pid + uuid),
full write, then the kernel-atomic rename — concurrent writers race
only at the replace, so the published file is always ONE writer's
complete document (last-writer-wins).

Extracted in r8 after the same discipline had to be hardened twice
(ann._write_meta, index_sync._advance_watermark).
"""

from __future__ import annotations

import json
import os
import uuid


def atomic_write_json(target: str, obj: dict) -> None:
    tmp = f"{target}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, target)
