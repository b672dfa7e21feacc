"""Cross-validate the regex symbol grammar against the exact Python AST
extractor over a corpus of real-world Python files (the reference repo's
own source, ~40k LoC). Python is the one language with in-repo ground
truth (textcore/pyast.py), so it measures how wrong a tree-sitter-less
regex grammar is on real code — the X8 accuracy number VERDICT r4 #4
asked for.

Usage: python tools/polyglot_xval.py [corpus_root] [--dump-errors]
Prints one JSON line: per-kind precision/recall + corpus size.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hades_spark.textcore.polyglot import _extract_generic  # noqa: E402
from hades_spark.textcore.pyast import extract_symbols as py_ast  # noqa: E402


def xval_file(src: str):
    truth = py_ast(src)
    if truth["error"]:
        return None
    want_fn = {(s["name"], s["start_line"]) for s in truth["symbols"]
               if s["kind"] in ("function", "method")}
    want_cls = {(s["name"], s["start_line"]) for s in truth["symbols"]
                if s["kind"] == "class"}
    pred = _extract_generic(src)
    got_fn = {(d["name"], d["line"]) for d in pred["functions"]}
    got_cls = {(d["name"], d["line"]) for d in pred["classes"]}
    return want_fn, got_fn, want_cls, got_cls


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 and not
                sys.argv[1].startswith("-") else "/root/reference/core")
    dump = "--dump-errors" in sys.argv
    tp = {"fn": 0, "cls": 0}; fp = {"fn": 0, "cls": 0}; fn_ = {"fn": 0, "cls": 0}
    files = 0
    errors = []
    for p in sorted(root.rglob("*.py")):
        try:
            src = p.read_text(errors="replace")
        except OSError:
            continue
        r = xval_file(src)
        if r is None:
            continue
        files += 1
        want_fn, got_fn, want_cls, got_cls = r
        tp["fn"] += len(want_fn & got_fn); fp["fn"] += len(got_fn - want_fn)
        fn_["fn"] += len(want_fn - got_fn)
        tp["cls"] += len(want_cls & got_cls); fp["cls"] += len(got_cls - want_cls)
        fn_["cls"] += len(want_cls - got_cls)
        if dump:
            for name, line in sorted(got_fn - want_fn)[:5]:
                errors.append(("FP-fn", str(p), line, name,
                               src.splitlines()[line - 1][:100]))
            for name, line in sorted(want_fn - got_fn)[:5]:
                errors.append(("FN-fn", str(p), line, name,
                               src.splitlines()[line - 1][:100]))
            for name, line in sorted(got_cls - want_cls)[:5]:
                errors.append(("FP-cls", str(p), line, name,
                               src.splitlines()[line - 1][:100]))
            for name, line in sorted(want_cls - got_cls)[:5]:
                errors.append(("FN-cls", str(p), line, name,
                               src.splitlines()[line - 1][:100]))
    out = {"files": files}
    for k in ("fn", "cls"):
        p_ = tp[k] / max(tp[k] + fp[k], 1)
        r_ = tp[k] / max(tp[k] + fn_[k], 1)
        out[f"{k}_precision"] = round(p_, 4)
        out[f"{k}_recall"] = round(r_, 4)
        out[f"{k}_tp"] = tp[k]; out[f"{k}_fp"] = fp[k]; out[f"{k}_fn"] = fn_[k]
    print(json.dumps(out))
    if dump:
        for e in errors[:80]:
            print(*e, sep="\t")


if __name__ == "__main__":
    main()
