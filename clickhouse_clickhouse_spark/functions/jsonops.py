"""JSON compat operations with no Spark-native carrier.

``JSONMergePatch`` ([U] src/Functions/jsonMergePatch.cpp) implements
RFC 7386 JSON Merge Patch: objects merge key-recursively, an explicit
null REMOVES the key, and any non-object patch replaces the target
wholesale. The algorithm is fully specified by the RFC, so this
pandas-UDF rendering is semantics-exact; output is compact-separator
JSON (upstream's whitespace-free rendering). Compat path (per-row
python over Arrow batches) — JSON restructuring at scale should go
through from_json/to_json at a known schema.
"""

from __future__ import annotations

import json

# module-level: pandas_udf type-hint inference resolves 'pd.Series'
# against the DEFINING module's globals
import pandas as pd  # noqa: F401

_UDF = None


def _merge(target, patch):
    """RFC 7386: merge ``patch`` into ``target``."""
    if not isinstance(patch, dict):
        return patch
    out = dict(target) if isinstance(target, dict) else {}
    for k, v in patch.items():
        if v is None:
            out.pop(k, None)
        else:
            out[k] = _merge(out.get(k), v)
    return out


def json_merge_patch_udf():
    global _UDF
    if _UDF is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _jmp(a: pd.Series, b: pd.Series) -> pd.Series:
            out = []
            for x, y in zip(a, b):
                if x is None or y is None:
                    out.append(None)
                    continue
                try:
                    merged = _merge(json.loads(x), json.loads(y))
                except ValueError as e:
                    raise ValueError(
                        f"JSONMergePatch: argument is not valid JSON "
                        f"({str(e)[:60]})") from e
                out.append(json.dumps(merged, separators=(",", ":")))
            return pd.Series(out)
        _UDF = _jmp
    return _UDF


def json_paths_py(s: str) -> list[str]:
    """Distinct dotted key paths of one JSON document ([U]
    distinctJSONPaths semantics: leaf paths, arrays treated as leaf
    values like the upstream JSON type's dynamic paths). Depth-bounded
    walk (64) — per-row bounded work."""
    try:
        doc = json.loads(s)
    except ValueError:
        return []
    out: list[str] = []

    def walk(node, prefix, depth):
        if depth > 64 or not isinstance(node, dict):
            return
        for k, v in node.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict) and v:
                walk(v, p, depth + 1)
            else:
                out.append(p)

    walk(doc, "", 0)
    return sorted(set(out))


_PATHS_UDF = None


def json_paths_udf():
    global _PATHS_UDF
    if _PATHS_UDF is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def _jp(a: pd.Series) -> pd.Series:
            return a.map(lambda v: None if v is None
                         else json_paths_py(v))
        _PATHS_UDF = _jp
    return _PATHS_UDF
