"""Browser front end for the HTTP query API — the reference's
Streamlit page (``query_interface.py:1-200``) as ONE dependency-free
static HTML page served from ``GET /``.

The reference UI's surface: list the lake's tables, let the user type
SQL, run it bounded, render a results table, and offer the canned
sample queries. This page does exactly that against the JSON endpoints
``serving_http.py`` already exposes (/tables, /describe, /query,
/explain, /samples) using only browser built-ins (fetch + DOM) — no
framework, no CDN, nothing to install, works from the same origin the
API serves on. The SQL never renders into the page as HTML (textContent
only), and every result is bounded server-side by ROW_CAP regardless of
what the page asks for.
"""

from __future__ import annotations

INDEX_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>Medallion Lake — SQL console</title>
<style>
  :root { --bg:#101418; --panel:#1a2028; --line:#2a3442; --fg:#d7dde5;
          --dim:#8b97a5; --acc:#4fa3e3; --bad:#e36a5f; }
  * { box-sizing:border-box; }
  body { margin:0; background:var(--bg); color:var(--fg);
         font:14px/1.45 system-ui, sans-serif; }
  header { padding:14px 20px; border-bottom:1px solid var(--line);
           display:flex; align-items:baseline; gap:12px; }
  header h1 { font-size:16px; margin:0; font-weight:600; }
  header span { color:var(--dim); font-size:12px; }
  main { display:grid; grid-template-columns:220px 1fr; gap:0;
         min-height:calc(100vh - 49px); }
  nav { border-right:1px solid var(--line); padding:12px; }
  nav h2 { font-size:11px; text-transform:uppercase; letter-spacing:.08em;
           color:var(--dim); margin:4px 0 8px; }
  nav button { display:block; width:100%; text-align:left; margin:2px 0;
               padding:5px 8px; background:none; border:0; border-radius:4px;
               color:var(--fg); font:inherit; cursor:pointer; }
  nav button:hover { background:var(--panel); color:var(--acc); }
  section { padding:16px 20px; min-width:0; }
  textarea { width:100%; height:110px; background:var(--panel);
             color:var(--fg); border:1px solid var(--line); border-radius:6px;
             padding:10px; font:13px/1.5 ui-monospace, monospace; resize:vertical; }
  .bar { margin:10px 0; display:flex; gap:8px; align-items:center; }
  .bar button { padding:7px 16px; border:0; border-radius:6px;
                background:var(--acc); color:#fff; font:inherit; cursor:pointer; }
  .bar button.ghost { background:var(--panel); color:var(--fg);
                      border:1px solid var(--line); }
  .bar input { width:90px; background:var(--panel); color:var(--fg);
               border:1px solid var(--line); border-radius:6px; padding:6px 8px; }
  #status { color:var(--dim); font-size:12px; }
  #status.err { color:var(--bad); }
  .wrap { overflow:auto; max-height:60vh; border:1px solid var(--line);
          border-radius:6px; }
  table { border-collapse:collapse; width:100%; font-size:13px; }
  th, td { padding:5px 10px; border-bottom:1px solid var(--line);
           text-align:left; white-space:nowrap; }
  th { position:sticky; top:0; background:var(--panel); color:var(--dim);
       font-weight:600; }
  tr:hover td { background:var(--panel); }
  pre { background:var(--panel); border:1px solid var(--line);
        border-radius:6px; padding:10px; overflow:auto; max-height:60vh; }
</style>
</head>
<body>
<header><h1>Medallion Lake</h1><span>SQL console — results bounded server-side</span></header>
<main>
  <nav>
    <h2>Tables</h2>
    <div id="tables"><span style="color:var(--dim)">loading…</span></div>
    <h2 style="margin-top:14px">Canned pack</h2>
    <button id="samples">Run sample queries</button>
  </nav>
  <section>
    <textarea id="sql" spellcheck="false"
      placeholder="SELECT * FROM ... LIMIT 20">SELECT * FROM documents LIMIT 10</textarea>
    <div class="bar">
      <button id="run">Run</button>
      <button id="explain" class="ghost">Explain</button>
      <label for="maxrows" style="color:var(--dim)">max rows</label>
      <input id="maxrows" type="number" value="100" min="1">
      <span id="status"></span>
    </div>
    <div id="out"></div>
  </section>
</main>
<script>
"use strict";
const $ = id => document.getElementById(id);
const status_ = (msg, err) => {
  $("status").textContent = msg; $("status").className = err ? "err" : "";
};

async function api(path, body) {
  const res = await fetch(path, body === undefined ? {} : {
    method: "POST", headers: {"Content-Type": "application/json"},
    body: JSON.stringify(body),
  });
  const data = await res.json();
  if (!res.ok) throw new Error(data.error || res.statusText);
  return data;
}

function renderTable(result) {
  const wrap = document.createElement("div"); wrap.className = "wrap";
  const tbl = document.createElement("table");
  const head = tbl.createTHead().insertRow();
  for (const c of result.columns) {
    const th = document.createElement("th"); th.textContent = c;
    head.appendChild(th);
  }
  const body = tbl.createTBody();
  for (const row of result.rows) {
    const tr = body.insertRow();
    for (const v of row) {
      tr.insertCell().textContent =
        v === null ? "∅" : typeof v === "object" ? JSON.stringify(v) : String(v);
    }
  }
  wrap.appendChild(tbl);
  $("out").replaceChildren(wrap);
}

async function runQuery() {
  status_("running…");
  try {
    const t0 = performance.now();
    const r = await api("/query", {
      sql: $("sql").value, max_rows: Number($("maxrows").value) || 100,
    });
    renderTable(r);
    status_(`${r.row_count} row(s) · server ${r.elapsed_sec}s · ` +
            `round-trip ${((performance.now() - t0) / 1000).toFixed(2)}s` +
            (r.row_count >= r.truncated_at
              ? ` · row cap ${r.truncated_at} reached` : ""));
  } catch (e) { status_(e.message, true); }
}

async function explainQuery() {
  status_("planning…");
  try {
    const r = await api("/explain", {sql: $("sql").value});
    const pre = document.createElement("pre");
    pre.textContent = JSON.stringify(r, null, 2);
    $("out").replaceChildren(pre);
    status_("plan only — nothing executed");
  } catch (e) { status_(e.message, true); }
}

async function loadTables() {
  try {
    const r = await api("/tables");
    const box = $("tables"); box.replaceChildren();
    for (const t of r.tables) {
      const b = document.createElement("button");
      b.textContent = t;
      b.onclick = () => {
        $("sql").value = `SELECT * FROM ${t} LIMIT 20`; runQuery();
      };
      box.appendChild(b);
    }
  } catch (e) { status_(e.message, true); }
}

async function runSamples() {
  status_("running canned pack…");
  try {
    const r = await api("/samples");
    const box = document.createElement("div");
    for (const [name, result] of Object.entries(r)) {
      const h = document.createElement("h3");
      h.textContent = name; h.style.margin = "14px 0 6px";
      box.appendChild(h);
      const wrap = document.createElement("div"); wrap.className = "wrap";
      const tbl = document.createElement("table");
      const head = tbl.createTHead().insertRow();
      for (const c of result.columns) {
        const th = document.createElement("th"); th.textContent = c;
        head.appendChild(th);
      }
      const body = tbl.createTBody();
      for (const row of result.rows) {
        const tr = body.insertRow();
        for (const v of row) {
          tr.insertCell().textContent =
            v === null ? "∅" : typeof v === "object" ? JSON.stringify(v) : String(v);
        }
      }
      wrap.appendChild(tbl); box.appendChild(wrap);
    }
    $("out").replaceChildren(box);
    status_(`${Object.keys(r).length} canned quer${Object.keys(r).length === 1 ? "y" : "ies"}`);
  } catch (e) { status_(e.message, true); }
}

$("run").onclick = runQuery;
$("explain").onclick = explainQuery;
$("samples").onclick = runSamples;
$("sql").addEventListener("keydown", e => {
  if ((e.ctrlKey || e.metaKey) && e.key === "Enter") runQuery();
});
loadTables();
</script>
</body>
</html>
"""
