#!/usr/bin/env python
"""Render docs/*.md into a static HTML site under site/ for GitHub Pages.

The deploy end state matches the reference's docs pipeline (reference:
docs.yml:28-31 publishes pdoc HTML to Pages); here the source of truth is
the generated docs/API.md (tools/gen_docs.py) plus the hand-written
guides, converted with python-markdown when available and embedded as
<pre> otherwise (so the tool runs in any environment).

Run: python tools/render_docs_html.py   -> site/index.html + one page per doc
"""

import glob
import html
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, 'docs')
SITE = os.path.join(REPO, 'site')

_PAGE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>dl4ds_tpu — {title}</title>
<style>
 body {{ max-width: 60rem; margin: 2rem auto; padding: 0 1rem;
        font: 16px/1.55 system-ui, sans-serif; color: #1a1a1a; }}
 pre, code {{ background: #f5f5f5; border-radius: 4px; }}
 pre {{ padding: .8rem; overflow-x: auto; }}
 code {{ padding: .1rem .3rem; }}
 pre code {{ padding: 0; }}
 table {{ border-collapse: collapse; }}
 td, th {{ border: 1px solid #ccc; padding: .3rem .6rem; }}
 nav a {{ margin-right: 1rem; }}
 h1, h2 {{ border-bottom: 1px solid #eee; padding-bottom: .2rem; }}
</style></head><body>
<nav>{nav}</nav>
{body}
</body></html>
"""


def _render(md_text):
    try:
        import markdown
        return markdown.markdown(
            md_text, extensions=['tables', 'fenced_code'])
    except ImportError:
        return f'<pre>{html.escape(md_text)}</pre>'


def main():
    os.makedirs(SITE, exist_ok=True)
    pages = sorted(glob.glob(os.path.join(DOCS, '*.md')))
    if not any(p.endswith('API.md') for p in pages):
        raise SystemExit('docs/API.md missing — run tools/gen_docs.py first')
    names = [os.path.splitext(os.path.basename(p))[0] for p in pages]
    nav = ' | '.join(
        f'<a href="{"index" if n == "API" else n}.html">{n}</a>'
        for n in names)
    for path, name in zip(pages, names):
        with open(path) as fh:
            body = _render(fh.read())
        out = 'index.html' if name == 'API' else f'{name}.html'
        with open(os.path.join(SITE, out), 'w') as fh:
            fh.write(_PAGE.format(title=name, nav=nav, body=body))
    print(f'site/: {len(pages)} pages from docs/*.md')


if __name__ == '__main__':
    main()
