"""OSRM client plumbing: router registry + retrying HTTP.

Mirrors the reference's config contract (`/root/reference/erde/cfg.py:4-12,45-49`:
named routers from layered YAML ``~/.erde.yml`` then ``./erde.yml``; here
``~/.erde_spark.yml`` / ``./erde_spark.yml``) and its retry policy
(`/root/reference/erde/utils.py:104-133`: N attempts, linear backoff of
``attempt`` seconds). The registry is read on the driver and the resolved
URL travels to executors inside the kernel closure — executors never read
local config files.
"""

from __future__ import annotations

import os
import re
import time

DEFAULT_CONFIG = {'routers': {'local': 'http://localhost:5000'}}


def data_merge(base, upd):
    """Recursive dict/list config merge (reference `erde/cfg.py:19-42`
    semantics: dicts merge by key, lists extend, scalars overwrite)."""
    if isinstance(base, dict) and isinstance(upd, dict):
        out = dict(base)
        for k, v in upd.items():
            out[k] = data_merge(base[k], v) if k in base else v
        return out
    if isinstance(base, list) and isinstance(upd, list):
        return base + upd
    return upd


def load_config() -> dict:
    cfg = dict(DEFAULT_CONFIG)
    try:
        import yaml
    except ImportError:
        return cfg
    for path in (os.path.expanduser('~/.erde_spark.yml'), './erde_spark.yml'):
        if os.path.exists(path):
            with open(path) as f:
                loaded = yaml.safe_load(f) or {}
            cfg = data_merge(cfg, loaded)
    return cfg


def resolve_router(mode: str, config: dict | None = None) -> str:
    """Router name from config, or a literal http(s) URL."""
    cfg = config or load_config()
    routers = cfg.get('routers', {})
    if mode in routers:
        return routers[mode]
    if re.match(r'^https?://', mode):
        return mode
    raise ValueError(
        f"router must be a key in the config 'routers' section or a URL, got {mode!r}")


def get_retry(url: str, params: dict | None = None, retries: int = 10,
              timeout: int = 60, backoff: float = 1.0):
    """GET with linear-backoff retries: before attempt N (1-based) sleeps
    ``N * backoff`` seconds, like the reference's policy."""
    import requests
    last = None
    for attempt in range(retries):
        try:
            return requests.get(url, params=params or {}, timeout=timeout)
        except (requests.exceptions.ConnectionError,
                requests.exceptions.ConnectTimeout) as e:
            last = e
            time.sleep((attempt + 1) * backoff)
    raise last
