"""Engine configuration (the ``metisd.yaml`` analogue).

The reference loads a small YAML of paths + logging with an /etc -> local
fallback chain (``Metis/python/MetisConfig.py:21-37``, ``Metis/metisd.yaml``).
Metis-Ray mirrors the shape as a dataclass with the same precedence:
explicit path > $METIS_RAY_CONFIG > defaults.  YAML is optional (ray ships
pyyaml; gated anyway), JSON always works.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class EngineConfig:
    # paths (the reference's main-daemon-path / hdf5-write-path analogues)
    corpus_dir: str = "/tmp/metis_ray_corpus/small"
    work_dir: str = "/tmp/metis_ray_work"
    checkpoint_dir: str = "/tmp/metis_ray_work/ckpt"
    # partitioning / execution
    num_partitions: int = 8
    checkpoint_every: int = 10
    # algorithms
    alpha: float = 0.85
    tol: float = 1e-9
    max_iter: int = 200
    lpa_max_iter: int = 30
    # logging (mirrors the reference's logging block)
    log_level: str = "INFO"
    extra: dict = field(default_factory=dict)

    @classmethod
    def load(cls, path: str | None = None) -> "EngineConfig":
        path = path or os.environ.get("METIS_RAY_CONFIG")
        if not path or not os.path.exists(path):
            return cls()
        with open(path) as fh:
            text = fh.read()
        data = None
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml  # bundled with ray; gated regardless
                data = yaml.safe_load(text)
            except ImportError:
                pass
        if data is None:
            data = json.loads(text)
        known = {k: v for k, v in data.items() if k in cls.__dataclass_fields__}
        unknown = {k: v for k, v in data.items() if k not in cls.__dataclass_fields__}
        cfg = cls(**known)
        cfg.extra.update(unknown)
        return cfg

    def dump(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(asdict(self), fh, indent=1)
