"""The documentation site must build clean (VERDICT round 2, item 9).

The reference ships a Sphinx/RTD site (docs/pages/*.rst,
.readthedocs.yml); this repo's docs build with a self-contained stdlib
builder (docs/build.py) since sphinx isn't installable here.  Building
in CI (this test) is the "docs build clean" gate.
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "docs"))

import build as docs_build  # noqa: E402


def test_docs_build_clean(tmp_path):
    files = docs_build.build(str(tmp_path))
    # every hand-written page + the API index rendered
    names = {os.path.relpath(f, tmp_path) for f in files}
    for page, sub in docs_build.PAGE_ORDER:
        rel = f"{sub}/{page}.html" if sub else f"{page}.html"
        assert rel in names, f"missing page {rel}"
    assert "api/index.html" in names
    # API pages cover the package's public modules
    api = [n for n in names if n.startswith("api/gym_collision_avoidance_tpu")]
    assert len(api) >= 20, f"API reference too thin: {len(api)} modules"
    # no silent import failures in the API reference
    for f in files:
        if "api/" in f:
            with open(f) as fh:
                assert "import failed" not in fh.read(), f


def test_markdown_renderer_basics():
    html = docs_build.md_to_html(
        "# Title\n\npara with `code` and **bold**\n\n"
        "- item1\n- item2\n\n```python\nx = 1\n```\n\n"
        "| a | b |\n|---|---|\n| 1 | 2 |\n")
    for frag in ("<h1", "<code>code</code>", "<strong>bold</strong>",
                 "<ul>", "<li>item1</li>", "<pre><code",
                 "<table>", "<td>1</td>"):
        assert frag in html, frag
