"""Self-contained interactive HTML explorer for kinopt / tfopt fits.

Behavioral spec: the interactive capabilities of the reference Streamlit
apps ``app/kinopt.py`` / ``app/tfopt.py`` (curve browsing, knockout
previews with before/after overlays, pan-able network rendering via
gravis) — re-delivered as ONE static HTML file with zero runtime
dependencies: the fit data is embedded as JSON and a small vanilla-JS
layer renders SVG time-series plots, a knockout simulator backed by
EXACT re-predictions (precomputed on device for every regulator), and an
interactive layered network view with hover tooltips and click-to-
highlight. Works from `file://`, no server, no streamlit/gravis.
"""

from __future__ import annotations

import json
import os

import numpy as np

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 0; background: #f6f7f9; color: #1a1a2e; }
header { background: #1a1a2e; color: #fff; padding: 14px 28px; }
header h1 { margin: 0; font-size: 19px; font-weight: 600; }
header .sub { color: #9aa3b2; font-size: 12px; margin-top: 3px; }
.wrap { max-width: 1180px; margin: 18px auto; padding: 0 16px; }
.card { background: #fff; border-radius: 10px; padding: 18px 20px;
        margin-bottom: 18px; box-shadow: 0 1px 4px rgba(16,24,40,.08); }
.card h2 { margin: 0 0 10px; font-size: 15px; }
.row { display: flex; gap: 14px; flex-wrap: wrap; align-items: center; }
select { padding: 6px 10px; border: 1px solid #cfd6e0; border-radius: 6px;
         font-size: 13px; background: #fff; max-width: 320px; }
.stat { display: inline-block; background: #eef2f7; border-radius: 8px;
        padding: 8px 14px; margin: 4px 6px 4px 0; font-size: 12px; }
.stat b { display: block; font-size: 16px; }
svg text { font-family: inherit; }
.legend { font-size: 12px; color: #444; margin-top: 4px; }
.legend span { margin-right: 16px; }
.dot { display: inline-block; width: 10px; height: 10px;
       border-radius: 5px; margin-right: 4px; vertical-align: -1px; }
table.ko { border-collapse: collapse; font-size: 12px; width: 100%; }
table.ko th, table.ko td { border-bottom: 1px solid #e6e9ef;
                           padding: 5px 8px; text-align: left; }
table.ko tr.sel { background: #eef6ff; }
table.ko tbody tr { cursor: pointer; }
.hint { color: #68728a; font-size: 12px; }
"""

_JS = """
'use strict';
var D = window.__FITDATA__;

function el(tag, attrs) {
  var e = document.createElementNS('http://www.w3.org/2000/svg', tag);
  for (var k in (attrs || {})) e.setAttribute(k, attrs[k]);
  return e;
}

function drawSeries(svg, times, series, opts) {
  // series: [{y: [...], color, width, dash, label, marker}]
  while (svg.firstChild) svg.removeChild(svg.firstChild);
  var W = +svg.getAttribute('width'), H = +svg.getAttribute('height');
  var m = {l: 46, r: 12, t: 10, b: 26};
  var xs = times, lo = Infinity, hi = -Infinity;
  series.forEach(function (s) { s.y.forEach(function (v) {
    if (v < lo) lo = v; if (v > hi) hi = v; }); });
  if (!(lo < hi)) { lo -= 1; hi += 1; }
  var pad = (hi - lo) * 0.08; lo -= pad; hi += pad;
  var xmax = xs[xs.length - 1] || 1;
  var X = function (t) { return m.l + (W - m.l - m.r) * t / xmax; };
  var Y = function (v) { return H - m.b - (H - m.t - m.b) * (v - lo) / (hi - lo); };
  // axes
  svg.appendChild(el('line', {x1: m.l, y1: H - m.b, x2: W - m.r,
    y2: H - m.b, stroke: '#b9c0cc'}));
  svg.appendChild(el('line', {x1: m.l, y1: m.t, x2: m.l, y2: H - m.b,
    stroke: '#b9c0cc'}));
  for (var g = 0; g <= 4; g++) {
    var v = lo + (hi - lo) * g / 4, yy = Y(v);
    svg.appendChild(el('line', {x1: m.l, y1: yy, x2: W - m.r, y2: yy,
      stroke: '#edf0f4'}));
    var t = el('text', {x: m.l - 6, y: yy + 4, 'text-anchor': 'end',
      'font-size': 10, fill: '#68728a'});
    t.textContent = v.toPrecision(3); svg.appendChild(t);
  }
  xs.forEach(function (tv, i) {
    if (xs.length > 10 && i % 2) return;
    var t = el('text', {x: X(tv), y: H - m.b + 14, 'text-anchor': 'middle',
      'font-size': 10, fill: '#68728a'});
    t.textContent = tv; svg.appendChild(t);
  });
  series.forEach(function (s) {
    var d = s.y.map(function (v, i) {
      return (i ? 'L' : 'M') + X(xs[i]).toFixed(1) + ',' + Y(v).toFixed(1);
    }).join(' ');
    var p = el('path', {d: d, fill: 'none', stroke: s.color,
      'stroke-width': s.width || 2});
    if (s.dash) p.setAttribute('stroke-dasharray', s.dash);
    svg.appendChild(p);
    if (s.marker) s.y.forEach(function (v, i) {
      svg.appendChild(el('circle', {cx: X(xs[i]), cy: Y(v), r: 2.6,
        fill: s.color}));
    });
  });
}

// ---- curve explorer -------------------------------------------------------
var curveSel = document.getElementById('curve-select');
D.curves.forEach(function (c, i) {
  var o = document.createElement('option');
  o.value = i; o.textContent = c.name; curveSel.appendChild(o);
});
function showCurve() {
  var c = D.curves[+curveSel.value];
  drawSeries(document.getElementById('curve-svg'), D.times, [
    {y: c.obs, color: '#8d99ae', width: 1.5, marker: true},
    {y: c.est, color: '#1461d6', width: 2.2}
  ]);
  var resid = c.est.map(function (v, i) { return v - c.obs[i]; });
  var rmse = Math.sqrt(resid.reduce(function (a, r) { return a + r * r; }, 0)
                       / resid.length);
  document.getElementById('curve-rmse').textContent = rmse.toPrecision(4);
}
curveSel.addEventListener('change', showCurve);

// ---- knockout simulator ---------------------------------------------------
var koSel = document.getElementById('ko-select');
D.knockouts.forEach(function (k, i) {
  var o = document.createElement('option');
  o.value = i; o.textContent = k.name; koSel.appendChild(o);
});
var koTargetIdx = 0;
function showKO() {
  var k = D.knockouts[+koSel.value];
  var tbody = document.getElementById('ko-tbody');
  tbody.innerHTML = '';
  k.top.forEach(function (t, row) {
    var tr = document.createElement('tr');
    if (row === koTargetIdx) tr.className = 'sel';
    tr.innerHTML = '<td>' + D.curves[t.c].name + '</td><td>'
      + t.d.toPrecision(4) + '</td>';
    tr.addEventListener('click', function () {
      koTargetIdx = row; showKO();
    });
    tbody.appendChild(tr);
  });
  var pick = k.top[Math.min(koTargetIdx, k.top.length - 1)];
  if (!pick) return;
  var c = D.curves[pick.c];
  drawSeries(document.getElementById('ko-svg'), D.times, [
    {y: c.obs, color: '#8d99ae', width: 1.2, marker: true},
    {y: c.est, color: '#1461d6', width: 2},
    {y: pick.ko, color: '#d1342f', width: 2, dash: '6 4'}
  ]);
  document.getElementById('ko-total').textContent =
    k.total.toPrecision(4);
}
koSel.addEventListener('change', function () { koTargetIdx = 0; showKO(); });

// ---- network view ---------------------------------------------------------
(function network() {
  var svg = document.getElementById('net-svg');
  var W = +svg.getAttribute('width'), H = +svg.getAttribute('height');
  var nodes = D.network.nodes, edges = D.network.edges;
  var layers = {};
  nodes.forEach(function (n) {
    (layers[n.layer] = layers[n.layer] || []).push(n);
  });
  var L = Object.keys(layers).sort();
  L.forEach(function (ly, li) {
    layers[ly].forEach(function (n, i) {
      n.x = 70 + (W - 140) * li / Math.max(1, L.length - 1);
      n.y = 40 + (H - 80) * (i + 0.5) / layers[ly].length;
    });
  });
  var byId = {};
  nodes.forEach(function (n) { byId[n.id] = n; });
  var wmax = edges.reduce(function (a, e) {
    return Math.max(a, Math.abs(e.w)); }, 1e-12);
  var edgeEls = [];
  edges.forEach(function (e) {
    var a = byId[e.s], b = byId[e.t];
    if (!a || !b) return;
    var p = el('path', {
      d: 'M' + a.x + ',' + a.y + ' C' + ((a.x + b.x) / 2) + ',' + a.y + ' '
        + ((a.x + b.x) / 2) + ',' + b.y + ' ' + b.x + ',' + b.y,
      fill: 'none', stroke: e.w >= 0 ? '#1461d6' : '#d1342f',
      'stroke-opacity': 0.45,
      'stroke-width': (0.6 + 3.4 * Math.abs(e.w) / wmax).toFixed(2)});
    var ti = el('title');
    ti.textContent = e.s + ' -> ' + e.t + '  w=' + e.w.toPrecision(4);
    p.appendChild(ti);
    svg.appendChild(p);
    edgeEls.push({el: p, e: e});
  });
  nodes.forEach(function (n) {
    var g = el('g', {cursor: 'pointer'});
    g.appendChild(el('circle', {cx: n.x, cy: n.y, r: 7,
      fill: n.layer === '0' ? '#1a1a2e' : '#1461d6',
      stroke: '#fff', 'stroke-width': 1.5}));
    var t = el('text', {x: n.x + 10, y: n.y + 4, 'font-size': 10,
      fill: '#333'});
    t.textContent = n.id;
    g.appendChild(t);
    var ti = el('title');
    ti.textContent = n.id;
    g.appendChild(ti);
    g.addEventListener('click', function () {
      edgeEls.forEach(function (pe) {
        var on = pe.e.s === n.id || pe.e.t === n.id;
        pe.el.setAttribute('stroke-opacity', on ? 0.95 : 0.08);
      });
    });
    svg.appendChild(g);
  });
  svg.addEventListener('dblclick', function () {
    edgeEls.forEach(function (pe) {
      pe.el.setAttribute('stroke-opacity', 0.45); });
  });
})();

showCurve();
showKO();
"""


def _round(a, nd=4):
    # nan_to_num: NaN would serialize as bare `NaN`, which is valid JS but
    # invalid JSON — keep the payload strictly parseable
    return np.round(np.nan_to_num(np.asarray(a, float)), nd).tolist()


def write_interactive_explorer(path, *, title, times, curve_names, obs, est,
                               ko_names, ko_est, network_edges,
                               source_layer_names, max_targets_per_ko=12,
                               max_edges=120) -> str:
    """Write the single-file interactive explorer.

    Args:
      times: (T,) time grid.
      curve_names: list of C display names.
      obs, est: (C, T) observed / fitted matrices.
      ko_names: list of K regulator names.
      ko_est: (K, C, T) exact re-predictions with each regulator knocked
        out (computed on device by the caller).
      network_edges: DataFrame-like with source/target/weight columns
        (source, target, weight).
      source_layer_names: set of node ids to place on the regulator layer.
    """
    obs = np.asarray(obs, float)
    est = np.asarray(est, float)
    ko_est = np.asarray(ko_est, float)
    C = len(curve_names)

    curves = [{"name": str(curve_names[c]), "obs": _round(obs[c]),
               "est": _round(est[c])} for c in range(C)]

    knockouts = []
    for k, name in enumerate(ko_names):
        delta = np.abs(ko_est[k] - est).mean(axis=1)          # (C,)
        order = np.argsort(delta)[::-1][:max_targets_per_ko]
        top = [{"c": int(c), "d": float(delta[c]),
                "ko": _round(ko_est[k, c])} for c in order]
        knockouts.append({"name": str(name), "top": top,
                          "total": float(np.abs(ko_est[k] - est).sum())})

    rows = []
    for _, r in network_edges.head(max_edges).iterrows():
        rows.append({"s": str(r["source"]), "t": str(r["target"]),
                     "w": float(r["weight"])})
    node_ids = {e["s"] for e in rows} | {e["t"] for e in rows}
    nodes = [{"id": n, "layer": "0" if n in source_layer_names else "1"}
             for n in sorted(node_ids)]

    data = {"times": _round(times), "curves": curves,
            "knockouts": knockouts,
            "network": {"nodes": nodes, "edges": rows}}

    html = f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>{title}</title><style>{_CSS}</style></head>
<body>
<header><h1>{title}</h1>
<div class="sub">interactive explorer — {C} curves,
{len(ko_names)} knockout scenarios (exact re-predictions), self-contained
HTML (no server)</div></header>
<div class="wrap">

<div class="card"><h2>Curve explorer — observed vs fitted</h2>
<div class="row"><select id="curve-select"></select>
<span class="stat">RMSE <b id="curve-rmse">-</b></span></div>
<svg id="curve-svg" width="1100" height="320"></svg>
<div class="legend"><span><i class="dot" style="background:#8d99ae"></i>
observed</span><span><i class="dot" style="background:#1461d6"></i>
fitted</span></div></div>

<div class="card"><h2>Knockout simulator — exact re-prediction with one
regulator removed</h2>
<div class="row"><select id="ko-select"></select>
<span class="stat">total effect <b id="ko-total">-</b></span>
<span class="hint">click a row to plot that target</span></div>
<div class="row" style="align-items:flex-start">
<svg id="ko-svg" width="760" height="300"></svg>
<div style="flex:1;min-width:260px;max-height:300px;overflow:auto">
<table class="ko"><thead><tr><th>target</th><th>mean |&Delta;|</th></tr>
</thead><tbody id="ko-tbody"></tbody></table></div></div>
<div class="legend"><span><i class="dot" style="background:#8d99ae"></i>
observed</span><span><i class="dot" style="background:#1461d6"></i>
fitted</span><span><i class="dot" style="background:#d1342f"></i>
knockout</span></div></div>

<div class="card"><h2>Regulator network — click a node to highlight its
edges, double-click to reset, hover for weights</h2>
<svg id="net-svg" width="1100" height="520"></svg></div>

</div>
<script>window.__FITDATA__ = {json.dumps(data)};</script>
<script>{_JS}</script>
</body></html>
"""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(html)
    return path
