"""Documentation builder: Markdown pages + generated API reference -> HTML.

The reference ships a Sphinx/ReadTheDocs site (/root/reference/docs/conf.py,
.readthedocs.yml).  This image has no sphinx/mkdocs and installs are not
allowed, so the site is built by this self-contained stdlib renderer
instead: a small CommonMark-subset converter for the hand-written pages
(docs/pages/*.md) plus an API-reference generator that walks the
``gym_collision_avoidance_tpu`` package with ``inspect`` and renders every
public module/class/function docstring.

Usage:
    python docs/build.py [--out docs/_build/html]

The test suite builds the site into a tmpdir (tests/test_docs.py), so
"docs build clean in CI" is enforced by pytest.
"""

from __future__ import annotations

import argparse
import html
import importlib
import inspect
import os
import pkgutil
import re
import sys

DOCS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(DOCS_DIR)
sys.path.insert(0, REPO_ROOT)

PAGE_ORDER = [
    ("index", ""),
    ("install", "pages"),
    ("quickstart", "pages"),
    ("architecture", "pages"),
    ("config", "pages"),
    ("environment", "pages"),
    ("policies", "pages"),
    ("sensors", "pages"),
    ("dynamics", "pages"),
    ("scenarios", "pages"),
    ("training", "pages"),
    ("performance", "pages"),
]

CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; max-width: 54rem;
       margin: 2rem auto; padding: 0 1rem; color: #1a1a2e; line-height: 1.55; }
nav { font-size: 0.9rem; border-bottom: 1px solid #ddd; padding-bottom: 0.6rem;
      margin-bottom: 1.2rem; }
nav a { margin-right: 0.8rem; color: #30507a; text-decoration: none; }
code { background: #f2f3f7; padding: 0.1rem 0.3rem; border-radius: 3px;
       font-size: 0.92em; }
pre { background: #f2f3f7; padding: 0.8rem; border-radius: 6px; overflow-x: auto; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid #ccc; padding: 0.35rem 0.6rem; text-align: left; }
h1, h2, h3 { color: #10263f; }
.api-sig { background: #eef3fa; padding: 0.4rem 0.6rem; border-left: 3px solid
           #30507a; font-family: monospace; white-space: pre-wrap; }
.api-doc { margin: 0.4rem 0 1.4rem 1rem; white-space: pre-wrap; }
"""


def _inline(text: str) -> str:
    """Inline markdown: code spans, bold, italics, links."""
    out, pos = [], 0
    for m in re.finditer(r"`([^`]+)`", text):
        out.append(_inline_nocode(text[pos:m.start()]))
        out.append(f"<code>{html.escape(m.group(1))}</code>")
        pos = m.end()
    out.append(_inline_nocode(text[pos:]))
    return "".join(out)


def _inline_nocode(text: str) -> str:
    text = html.escape(text, quote=False)
    text = re.sub(r"\[([^\]]+)\]\(([^)]+)\)", r'<a href="\2">\1</a>', text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(r"(?<![\w*])\*([^*\s][^*]*)\*(?![\w*])", r"<em>\1</em>", text)
    return text


def md_to_html(md: str) -> str:
    """Small CommonMark subset: headings, fenced code, lists, tables,
    blockquotes, paragraphs.  Enough for these docs; not a general tool."""
    lines = md.split("\n")
    out, i = [], 0
    in_list = None
    para: list = []

    def flush_para():
        if para:
            out.append("<p>" + _inline(" ".join(para)) + "</p>")
            para.clear()

    def close_list():
        nonlocal in_list
        if in_list:
            out.append(f"</{in_list}>")
            in_list = None

    while i < len(lines):
        ln = lines[i]
        if ln.startswith("```"):
            flush_para(); close_list()
            lang = ln[3:].strip()
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i]); i += 1
            cls = f' class="language-{lang}"' if lang else ""
            out.append(f"<pre><code{cls}>" + html.escape("\n".join(block))
                       + "</code></pre>")
            i += 1
            continue
        m = re.match(r"^(#{1,4})\s+(.*)$", ln)
        if m:
            flush_para(); close_list()
            lvl = len(m.group(1))
            anchor = re.sub(r"[^a-z0-9]+", "-", m.group(2).lower()).strip("-")
            out.append(f'<h{lvl} id="{anchor}">{_inline(m.group(2))}</h{lvl}>')
            i += 1
            continue
        if ln.startswith("|") and i + 1 < len(lines) and \
                re.match(r"^\|[\s\-:|]+\|?\s*$", lines[i + 1]):
            flush_para(); close_list()
            header = [c.strip() for c in ln.strip("|").split("|")]
            out.append("<table><tr>" + "".join(
                f"<th>{_inline(c)}</th>" for c in header) + "</tr>")
            i += 2
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                out.append("<tr>" + "".join(
                    f"<td>{_inline(c)}</td>" for c in cells) + "</tr>")
                i += 1
            out.append("</table>")
            continue
        m = re.match(r"^(\s*)([-*]|\d+\.)\s+(.*)$", ln)
        if m:
            flush_para()
            tag = "ol" if m.group(2)[0].isdigit() else "ul"
            if in_list != tag:
                close_list()
                out.append(f"<{tag}>")
                in_list = tag
            item = [m.group(3)]
            while i + 1 < len(lines) and re.match(r"^\s{2,}\S", lines[i + 1]) \
                    and not re.match(r"^\s*([-*]|\d+\.)\s", lines[i + 1]):
                i += 1
                item.append(lines[i].strip())
            out.append("<li>" + _inline(" ".join(item)) + "</li>")
            i += 1
            continue
        if ln.startswith(">"):
            flush_para(); close_list()
            quote = []
            while i < len(lines) and lines[i].startswith(">"):
                quote.append(lines[i].lstrip("> ")); i += 1
            out.append("<blockquote><p>" + _inline(" ".join(quote))
                       + "</p></blockquote>")
            continue
        if not ln.strip():
            flush_para(); close_list()
            i += 1
            continue
        para.append(ln.strip())
        i += 1
    flush_para(); close_list()
    return "\n".join(out)


def _page(title: str, body: str, nav: str) -> str:
    return (f"<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>{html.escape(title)}</title><style>{CSS}</style></head>"
            f"<body><nav>{nav}</nav>{body}</body></html>")


def _nav(depth: int = 0) -> str:
    pre = "../" * depth
    links = []
    for name, sub in PAGE_ORDER:
        href = f"{pre}{name}.html" if not sub else f"{pre}{sub}/{name}.html"
        links.append(f'<a href="{href}">{name}</a>')
    links.append(f'<a href="{pre}api/index.html">API reference</a>')
    return " ".join(links)


# ---------------------------------------------------------------- API pages

API_PACKAGE = "gym_collision_avoidance_tpu"


def _doc_of(obj) -> str:
    return inspect.getdoc(obj) or ""


def _render_member(name: str, obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        sig = ""
    doc = html.escape(_doc_of(obj))
    return (f'<div class="api-sig">{html.escape(name)}{html.escape(sig)}</div>'
            f'<div class="api-doc">{doc}</div>')


def _render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    parts = [f"<h1><code>{modname}</code></h1>",
             f'<div class="api-doc">{html.escape(_doc_of(mod))}</div>']
    members = inspect.getmembers(mod)
    for name, obj in members:
        if name.startswith("_"):
            continue
        if inspect.isclass(obj) and obj.__module__ == modname:
            parts.append(f"<h2>class <code>{name}</code></h2>")
            parts.append(f'<div class="api-doc">{html.escape(_doc_of(obj))}</div>')
            for mname, mobj in inspect.getmembers(obj, inspect.isfunction):
                if mname.startswith("_") or mobj.__qualname__.split(".")[0] != name:
                    continue
                parts.append(_render_member(f"{name}.{mname}", mobj))
        elif inspect.isfunction(obj) and obj.__module__ == modname:
            parts.append(_render_member(name, obj))
    return "\n".join(parts)


def _walk_modules() -> list:
    pkg = importlib.import_module(API_PACKAGE)
    names = [API_PACKAGE]
    for _importer, modname, _ispkg in pkgutil.walk_packages(
            pkg.__path__, prefix=API_PACKAGE + "."):
        if ".weights" in modname or "._" in modname:
            continue
        names.append(modname)
    return sorted(names)


def build(out_dir: str) -> list:
    """Render the whole site; returns the list of written files."""
    written = []
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "api"), exist_ok=True)

    for name, sub in PAGE_ORDER:
        src = os.path.join(DOCS_DIR, sub, f"{name}.md") if sub else \
            os.path.join(DOCS_DIR, f"{name}.md")
        with open(src) as f:
            md = f.read()
        depth = 1 if sub else 0
        dest = os.path.join(out_dir, sub, f"{name}.html") if sub else \
            os.path.join(out_dir, f"{name}.html")
        title = md.split("\n", 1)[0].lstrip("# ")
        with open(dest, "w") as f:
            f.write(_page(title, md_to_html(md), _nav(depth)))
        written.append(dest)

    index_items = []
    for modname in _walk_modules():
        fname = modname.replace(".", "_") + ".html"
        try:
            body = _render_module(modname)
        except Exception as e:  # a module must never break the whole build
            body = f"<h1>{modname}</h1><p>import failed: {html.escape(str(e))}</p>"
        dest = os.path.join(out_dir, "api", fname)
        with open(dest, "w") as f:
            f.write(_page(modname, body, _nav(1)))
        written.append(dest)
        index_items.append(f'<li><a href="{fname}"><code>{modname}</code></a></li>')

    api_index = ("<h1>API reference</h1><ul>" + "\n".join(index_items) + "</ul>")
    dest = os.path.join(out_dir, "api", "index.html")
    with open(dest, "w") as f:
        f.write(_page("API reference", api_index, _nav(1)))
    written.append(dest)
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(DOCS_DIR, "_build", "html"))
    args = ap.parse_args()
    files = build(args.out)
    print(f"built {len(files)} pages -> {args.out}")


if __name__ == "__main__":
    main()
