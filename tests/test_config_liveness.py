"""Every MetaConfig field must be LIVE — read somewhere in the package.

VERDICT r3 found silently-ignored knobs (`separate_head`, `learn_inner`,
`freeze_*_bn` parsed fine and changed nothing). Those are wired now
(meta/episode.py, meta/inner_loop.py); this test enforces the invariant
going forward: a field that parses but is never *read* off a config
object anywhere outside its own definition fails here, forcing either a
real implementation or an entry in DOCUMENTED_DEAD with a rationale
(mirrored in docs/MIGRATION.md's not-ported table).

Behavioral coverage (flipping a field changes the episode loss) lives in
tests/test_separate_head.py::test_freeze_bn_flags_change_episode_loss and
the staging/learn-inner tests; this file only guards against the
parse-and-ignore failure mode returning.
"""
import dataclasses
import io
import pathlib
import re
import tokenize

import ood_object_detection_tpu
from ood_object_detection_tpu.meta.config import MetaConfig

PKG_ROOT = pathlib.Path(ood_object_detection_tpu.__file__).parent

# Fields intentionally without a package-side read, with rationale.
DOCUMENTED_DEAD: dict = {}

# Receivers whose attribute access counts as a config READ. Restricting
# to config-like names (advisor r4) keeps unrelated objects that happen
# to share a field name (e.g. `self.max_dets` on an evaluator) from
# masking a deleted MetaConfig read.
_CONFIG_RECEIVERS = r"(?:self\.)?(?:meta_cfg|meta_config|mcfg|cfg|config)"


def _strip_comments_and_strings(source: str) -> str:
    """Drop COMMENT and STRING tokens so prose mentions of a field name
    (docstrings, comments) cannot satisfy the liveness check."""
    out = []
    try:
        toks = tokenize.generate_tokens(io.StringIO(source).readline)
        for tok in toks:
            if tok.type in (tokenize.COMMENT, tokenize.STRING):
                continue
            out.append(tok.string)
    except tokenize.TokenError:  # pragma: no cover - malformed source
        return source
    return " ".join(out)


def _package_source_excluding_definition() -> str:
    chunks = []
    for p in sorted(PKG_ROOT.rglob("*.py")):
        if p.name == "config.py" and p.parent.name == "meta":
            continue  # the dataclass definition itself doesn't count
        chunks.append(_strip_comments_and_strings(p.read_text()))
    # repo-root bench.py also consumes MetaConfig (BENCH_MODE=meta)
    bench = PKG_ROOT.parent / "bench.py"
    if bench.exists():
        chunks.append(_strip_comments_and_strings(bench.read_text()))
    return "\n".join(chunks)


def test_every_meta_config_field_is_read_somewhere():
    src = _package_source_excluding_definition()
    dead = []
    for f in dataclasses.fields(MetaConfig):
        if f.name in DOCUMENTED_DEAD:
            continue
        # an attribute READ off a config-like receiver (`cfg.field`,
        # `meta_cfg.field`, `self.meta_cfg.field`, ...). Copying a CLI
        # arg into the constructor (`args.field`) is not a read, and
        # neither is `.field` on some unrelated object.
        pattern = re.compile(
            r"\b" + _CONFIG_RECEIVERS + r"\s*\.\s*" + re.escape(f.name)
            + r"\b")
        if not pattern.search(src):
            dead.append(f.name)
    assert not dead, (
        f"MetaConfig fields parsed but never read by the package: {dead}. "
        "Wire them up or add them to DOCUMENTED_DEAD with a rationale "
        "(and to docs/MIGRATION.md).")
