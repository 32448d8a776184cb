"""Config loading with env-template substitution.

Reproduces the reference semantics (reference main.py:25-38): the config
file is a JSON template containing ``$VAR`` placeholders substituted from
the environment; a missing variable raises ``ValueError``. Also carries
the S3 path helpers (reference main.py:41-50).
"""

from __future__ import annotations

import json
from string import Template


def load_config(config_path: str, env: dict[str, str] | None = None) -> dict:
    if env is None:
        import os

        env = dict(os.environ)
    template = open(config_path).read()
    return loads_config(template, env)


def loads_config(template: str, env: dict[str, str]) -> dict:
    try:
        config_str = Template(template).substitute(env)
    except KeyError as e:  # missing env var → ValueError, reference main.py:32-34
        raise ValueError(f"A missing environment variable: {e}")
    return json.loads(config_str)


def is_s3_path(path: str) -> bool:
    return path.startswith("s3://") or path.startswith("s3a://")


def split_s3_path(s3_address: str) -> tuple[str, str]:
    """('s3://bucket/some/key') -> ('bucket', 'some/key')."""
    without_scheme = s3_address.split("://", 1)[1]
    bucket, _, key = without_scheme.partition("/")
    return bucket, key


def as_spark_path(path: str) -> str:
    """Spark's S3 connector uses the s3a:// scheme."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://") :]
    return path
