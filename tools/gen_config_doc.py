#!/usr/bin/env python
"""Generate docs/CONFIG.md — the full config-key reference — from the
dataclass tree in slcl_tpu/config.py.

Field descriptions are pulled from the source: a field's trailing ``#``
comment plus any immediately preceding full-line comments. Run after any
config change:

    python tools/gen_config_doc.py
"""
import dataclasses
import inspect
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from slcl_tpu import config as C  # noqa: E402


def field_docs(cls):
    """Map field name -> description scraped from source comments."""
    src = inspect.getsource(cls)
    docs = {}
    pending = []
    for line in src.splitlines():
        stripped = line.strip()
        m = re.match(r"#\s?(.*)", stripped)
        if m and ":" not in stripped.split("#")[0]:
            pending.append(m.group(1))
            continue
        fm = re.match(r"(\w+)\s*:\s*[^=]+=.*?(?:#\s?(.*))?$", stripped)
        if fm:
            name = fm.group(1)
            trailing = fm.group(2) or ""
            text = " ".join(pending + ([trailing] if trailing else []))
            docs[name] = text.strip()
            pending = []
        elif stripped and not stripped.startswith("#"):
            # continuation lines of a multi-line comment block attached to
            # the previous field (e.g. trailing comment continuations)
            if pending and stripped.startswith('"'):
                pending = []
    return docs


def fmt_default(v):
    if isinstance(v, str):
        return f'`"{v}"`' if v else "`\"\"`"
    if isinstance(v, (tuple, list)):
        return "`" + repr(tuple(v)) + "`"
    return f"`{v}`"


def main():
    out = ["# Config reference",
           "",
           "Auto-generated from `slcl_tpu/config.py` by "
           "`tools/gen_config_doc.py`; do not edit by hand.",
           "",
           "Override any key on the CLI as `section.key=value` "
           "(e.g. `python scripts/train.py method=mccl contrastive.tau=0.05`) "
           "or via `--config file.yaml`.",
           ""]
    cfg = C.Config()
    top = field_docs(C.Config)
    out.append("## Top level")
    out.append("")
    out.append("| key | default | description |")
    out.append("|---|---|---|")
    out.append(f"| `method` | `\"{cfg.method}\"` | "
               "baseline \\| adaptseg \\| advent \\| mpscl \\| slcl \\| mccl "
               "\\| rain \\| pretrain_rain \\| adaptevery \\| ddfseg \\| bcl |")
    out.append("")
    for f in dataclasses.fields(C.Config):
        sub = getattr(cfg, f.name)
        if not dataclasses.is_dataclass(sub):
            continue
        cls = type(sub)
        docs = field_docs(cls)
        out.append(f"## `{f.name}.*` — {cls.__name__}")
        out.append("")
        doc = inspect.getdoc(cls)
        if doc:
            out.append(doc.replace("\n", " "))
            out.append("")
        out.append("| key | default | description |")
        out.append("|---|---|---|")
        for sf in dataclasses.fields(cls):
            desc = docs.get(sf.name, "").replace("|", "\\|")
            out.append(f"| `{f.name}.{sf.name}` | "
                       f"{fmt_default(getattr(sub, sf.name))} | {desc} |")
        out.append("")
    path = Path(__file__).resolve().parent.parent / "docs" / "CONFIG.md"
    path.write_text("\n".join(out) + "\n")
    print(f"wrote {path} ({len(out)} lines)")


if __name__ == "__main__":
    main()
