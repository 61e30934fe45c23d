"""docs/QUICKSTART.md executes: every fenced python block runs top to
bottom in one shared namespace, so the documented snippets cannot rot
(the reference's docs-consistency-guard philosophy applied to the
tutorial)."""

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quickstart_snippets_run():
    with open(os.path.join(ROOT, "docs", "QUICKSTART.md")) as f:
        text = f.read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.DOTALL)
    assert len(blocks) >= 6, f"expected >= 6 snippets, found {len(blocks)}"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"<quickstart block {i}>", "exec"), ns)
        except Exception as e:  # noqa: BLE001 — surface which block broke
            raise AssertionError(
                f"QUICKSTART block {i} failed: {e}\n---\n{block}") from e
