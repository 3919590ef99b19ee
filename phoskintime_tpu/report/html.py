"""Self-contained HTML report generator.

Spec: reference ``utils/display.py:204-333`` — a single HTML file embedding
a gallery of all result PNGs (base64-inlined so the file is portable) and
result tables, grouped per gene / section.
"""

from __future__ import annotations

import base64
import os
from datetime import datetime

import pandas as pd

_CSS = """
body { font-family: -apple-system, Helvetica, Arial, sans-serif; margin: 2em;
       color: #222; }
h1 { border-bottom: 2px solid #444; }
h2 { color: #2a5db0; margin-top: 1.6em; }
.gallery { display: flex; flex-wrap: wrap; gap: 12px; }
.gallery figure { margin: 0; }
.gallery img { max-width: 420px; border: 1px solid #ccc; border-radius: 4px; }
figcaption { font-size: 0.8em; color: #666; text-align: center; }
table { border-collapse: collapse; font-size: 0.85em; }
th, td { border: 1px solid #bbb; padding: 3px 8px; }
th { background: #eef; }
"""


def _img_tag(path: str) -> str:
    with open(path, "rb") as fh:
        b64 = base64.b64encode(fh.read()).decode()
    name = os.path.basename(path)
    return (f'<figure><img src="data:image/png;base64,{b64}" alt="{name}"/>'
            f"<figcaption>{name}</figcaption></figure>")


def create_report(results_dir: str, output_file: str = "report.html",
                  title: str = "phoskintime-tpu report",
                  tables: dict[str, pd.DataFrame] | None = None) -> str:
    """Walk ``results_dir``, embed every PNG + optional tables into one HTML."""
    results_dir = str(results_dir)
    sections: dict[str, list[str]] = {}
    for root, _dirs, files in os.walk(results_dir):
        pngs = sorted(f for f in files if f.endswith(".png"))
        if pngs:
            rel = os.path.relpath(root, results_dir)
            sections[rel] = [os.path.join(root, f) for f in pngs]

    parts = [f"<html><head><meta charset='utf-8'><title>{title}</title>",
             f"<style>{_CSS}</style></head><body>",
             f"<h1>{title}</h1>",
             f"<p>Generated {datetime.now():%Y-%m-%d %H:%M}</p>"]

    if tables:
        for name, df in tables.items():
            parts.append(f"<h2>{name}</h2>")
            parts.append(df.to_html(index=False, float_format="%.4g"))

    for section in sorted(sections):
        parts.append(f"<h2>{section if section != '.' else 'figures'}</h2>")
        parts.append("<div class='gallery'>")
        parts.extend(_img_tag(p) for p in sections[section])
        parts.append("</div>")

    parts.append("</body></html>")
    out = os.path.join(results_dir, output_file)
    with open(out, "w") as fh:
        fh.write("\n".join(parts))
    return out
