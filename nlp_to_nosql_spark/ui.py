"""Browser UI — the engine-side twin of the reference's Streamlit app
(``main.py:308-362``), served as one self-contained HTML page.

The reference ships a Streamlit client with a query form, metric tiles,
the generated Mongo query, a results table with CSV download, and a
client-side query-history dashboard (``main.py:174-276``).  This module
reproduces that surface with zero extra dependencies: a static page at
``GET /ui`` whose JavaScript drives the same HTTP API the Streamlit app
calls (``/health``, ``/query``) — so the UI exercises exactly the
endpoint contract, not a privileged side door.  History lives in the
browser (the Streamlit app keeps it in ``st.session_state``, same
lifetime), with the same summary metrics: total queries, success rate,
average execution time.

No external assets: the page must render inside an offline container.
"""

from __future__ import annotations

#: Validation ranges shown in the form — same as the reference's sliders
#: (``main.py:330-334``: limit 1..1000 default 50, timeout 5..60 default 30).
UI_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>NLP to NoSQL Query Interface</title>
<style>
  :root { color-scheme: light; }
  body { font-family: system-ui, sans-serif; margin: 0; background: #f6f7f9; color: #1a1d21; }
  header { background: #1f2937; color: #fff; padding: 14px 24px; }
  header h1 { font-size: 1.2rem; margin: 0; }
  header p { margin: 2px 0 0; font-size: .85rem; color: #cbd5e1; }
  main { max-width: 960px; margin: 24px auto; padding: 0 16px; }
  section { background: #fff; border: 1px solid #e2e8f0; border-radius: 8px; padding: 16px 20px; margin-bottom: 16px; }
  h2 { font-size: 1rem; margin: 0 0 12px; }
  label { display: block; font-size: .8rem; margin: 8px 0 2px; color: #475569; }
  textarea, input, button { font: inherit; }
  textarea { width: 100%; box-sizing: border-box; min-height: 64px; }
  .grid { display: grid; grid-template-columns: repeat(auto-fit, minmax(160px, 1fr)); gap: 12px; }
  .tiles { display: grid; grid-template-columns: repeat(auto-fit, minmax(140px, 1fr)); gap: 12px; margin-bottom: 12px; }
  .tile { background: #f8fafc; border: 1px solid #e2e8f0; border-radius: 6px; padding: 10px 12px; }
  .tile .v { font-size: 1.15rem; font-weight: 600; }
  .tile .k { font-size: .72rem; color: #64748b; text-transform: uppercase; letter-spacing: .04em; }
  table { border-collapse: collapse; width: 100%; font-size: .85rem; }
  th, td { border: 1px solid #e2e8f0; padding: 4px 8px; text-align: left; }
  th { background: #f1f5f9; }
  pre { background: #0f172a; color: #e2e8f0; padding: 12px; border-radius: 6px; overflow-x: auto; font-size: .8rem; }
  button { background: #2563eb; color: #fff; border: 0; border-radius: 6px; padding: 8px 16px; cursor: pointer; }
  button.secondary { background: #64748b; }
  .error { background: #fef2f2; border: 1px solid #fecaca; color: #991b1b; padding: 10px 12px; border-radius: 6px; }
  .hint { font-size: .8rem; color: #64748b; }
  .status-ok { color: #16a34a; } .status-bad { color: #dc2626; }
  .results-wrap { overflow-x: auto; max-height: 420px; overflow-y: auto; }
  footer { font-size: .8rem; color: #64748b; margin: 24px 0; }
  .suggest { background: #eef2ff; color: #3730a3; margin: 2px 4px 2px 0; padding: 4px 10px; border-radius: 999px; border: 0; font-size: .78rem; }
</style>
</head>
<body>
<header>
  <h1>&#128269; NLP to NoSQL Query Interface</h1>
  <p>Convert natural language to MongoDB-style queries and execute them on the Spark engine</p>
  <p id="api-status" class="hint">API: checking&hellip;</p>
</header>
<main>
  <section>
    <h2>&#128221; Query Input</h2>
    <form id="qform">
      <label for="q">Natural language query</label>
      <textarea id="q">Find all employees</textarea>
      <div class="grid">
        <div><label for="db">Database</label><input id="db" value="testdb"></div>
        <div><label for="coll">Collection</label><input id="coll" value="customer"></div>
        <div><label for="limit">Result limit (1&ndash;1000)</label>
             <input id="limit" type="number" min="1" max="1000" value="50"></div>
        <div><label for="timeout">Timeout s (5&ndash;60)</label>
             <input id="timeout" type="number" min="5" max="60" value="30"></div>
      </div>
      <p>
        <button type="submit">&#128640; Execute Query</button>
        <span id="spinner" class="hint" hidden>processing&hellip;</span>
      </p>
    </form>
    <div>
      <span class="hint">Suggested:</span>
      <button class="suggest" data-q="Find employees earning more than 50000">salary &gt; 50000</button>
      <button class="suggest" data-q="Show all engineers">all engineers</button>
      <button class="suggest" data-q="List employees older than 30">older than 30</button>
      <button class="suggest" data-q="Find all employees">find all</button>
    </div>
  </section>

  <section id="out" hidden>
    <h2>&#128202; Query Results</h2>
    <div class="tiles" id="tiles"></div>
    <div id="timing" class="hint"></div>
    <div id="errbox" class="error" hidden></div>
    <h2>&#128269; Generated Query</h2>
    <pre id="genq"></pre>
    <h2>&#128203; Results <button id="dl" class="secondary" hidden>&#128190; Download CSV</button></h2>
    <div class="results-wrap"><table id="results"></table></div>
  </section>

  <section id="hist-sec" hidden>
    <h2>&#128200; Query History <button id="clear" class="secondary">&#128465; Clear</button></h2>
    <div class="tiles" id="hist-tiles"></div>
    <div class="results-wrap"><table id="hist"></table></div>
  </section>

  <footer>
    <b>&#128161; Tips:</b> be specific about what you want to find; use clear
    field names (name, age, department, salary); increase the timeout for
    complex queries.
  </footer>
</main>
<script>
"use strict";
const $ = (id) => document.getElementById(id);
const history_ = [];

async function refreshStatus() {
  try {
    const h = await (await fetch("/health")).json();
    const cls = h.status === "healthy" ? "status-ok" : "status-bad";
    // h.status / h.version are wire data like everything else (a proxy
    // error page could shape this JSON): esc() before the innerHTML sink
    $("api-status").innerHTML =
      `API: <span class="${cls}">${esc(h.status)}</span> &middot; ` +
      `spark ${h.spark_connected ? "&#9989;" : "&#10060;"} &middot; ` +
      `compiler ${h.compiler_connected ? "&#9989;" : "&#10060;"} &middot; v${esc(h.version)}`;
  } catch (e) { $("api-status").textContent = "API: unreachable"; }
}

function tile(k, v) { return `<div class="tile"><div class="v">${v}</div><div class="k">${k}</div></div>`; }

// Everything that came over the wire (field values, column names, the
// user's own query text in the history table) is untrusted: escape it
// before any innerHTML sink, or a document containing "<img onerror=...>"
// executes in the viewer's browser.
function esc(v) {
  const s = v === null || v === undefined ? "" : String(v);
  return s.replace(/[&<>"']/g, (ch) => ({
    "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&#39;",
  })[ch]);
}

function renderTable(el, rows) {
  el.innerHTML = "";
  if (!rows || !rows.length) { el.innerHTML = "<tr><td>&#128237; No results</td></tr>"; return; }
  const cols = Object.keys(rows[0]);
  el.innerHTML =
    "<tr>" + cols.map(c => `<th>${esc(c)}</th>`).join("") + "</tr>" +
    rows.map(r => "<tr>" + cols.map(c => `<td>${esc(r[c])}</td>`).join("") + "</tr>").join("");
}

function toCsv(rows) {
  if (!rows || !rows.length) return "";
  const cols = Object.keys(rows[0]);
  const esc = (v) => { const s = v === null ? "" : String(v); return /[",\\n]/.test(s) ? '"' + s.replace(/"/g, '""') + '"' : s; };
  return [cols.join(",")].concat(rows.map(r => cols.map(c => esc(r[c])).join(","))).join("\\n");
}

function renderHistory() {
  $("hist-sec").hidden = history_.length === 0;
  if (!history_.length) { return; }
  const ok = history_.filter(h => h.success).length;
  const avg = history_.reduce((a, h) => a + h.execution_time, 0) / history_.length;
  $("hist-tiles").innerHTML =
    tile("Total Queries", history_.length) +
    tile("Success Rate", (100 * ok / history_.length).toFixed(1) + "%") +
    tile("Avg Execution Time", avg.toFixed(3) + "s");
  renderTable($("hist"), history_.map(h => ({
    query: h.query, success: h.success ? "\\u2705" : "\\u274c",
    execution_time: h.execution_time.toFixed(3), results: h.results, at: h.at,
  })));
}

function renderResult(res, httpStatus) {
  $("out").hidden = false;
  const okPath = res && res.ok;
  if (okPath) {
    $("errbox").hidden = true;
    $("tiles").innerHTML =
      tile("Status", "&#9989; Success") +
      tile("Execution Time", res.execution_time.toFixed(3) + "s") +
      tile("Results Found", res.total_matching) +
      tile("Results Returned", res.result_count);
    $("timing").textContent =
      (res.query_generation_time != null && res.db_execution_time != null)
        ? `\\u23f1 Query generation: ${res.query_generation_time.toFixed(3)}s, database: ${res.db_execution_time.toFixed(3)}s`
        : "";
    $("genq").textContent = JSON.stringify(res.mongo_query, null, 2);
    renderTable($("results"), res.results);
    $("dl").hidden = !res.results || !res.results.length;
    $("dl").onclick = () => {
      const blob = new Blob([toCsv(res.results)], { type: "text/csv" });
      const a = document.createElement("a");
      a.href = URL.createObjectURL(blob);
      a.download = "query_results.csv";
      a.click();
      URL.revokeObjectURL(a.href);
    };
  } else {
    const err = res || {};
    $("tiles").innerHTML =
      tile("Status", "&#10060; Error") +
      tile("Error Type", esc(err.error_type || "Unknown")) +
      tile("Status Code", esc(err.status_code || httpStatus || "N/A"));
    $("timing").textContent = "";
    let msg = "\\u274c " + (err.error || JSON.stringify(err.detail || err));
    const et = String(err.error_type || "").toUpperCase();
    if (et.includes("TIMEOUT")) msg += " \\u2014 \\ud83d\\udca1 try increasing the timeout value or simplifying the query";
    $("errbox").textContent = msg;
    $("errbox").hidden = false;
    $("genq").textContent = "";
    renderTable($("results"), []);
    $("dl").hidden = true;
  }
}

$("qform").addEventListener("submit", async (ev) => {
  ev.preventDefault();
  $("spinner").hidden = false;
  const query = $("q").value.trim();
  const body = {
    input: query, db: $("db").value, collection: $("coll").value,
    limit: Number($("limit").value), timeout: Number($("timeout").value),
  };
  const t0 = performance.now();
  let res = null, status = 0;
  try {
    const r = await fetch("/query", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(body),
    });
    status = r.status;
    res = await r.json();
  } catch (e) {
    res = { ok: false, error: String(e), error_type: "CONNECTION_ERROR" };
  }
  $("spinner").hidden = true;
  renderResult(res, status);
  history_.push({
    query, success: !!(res && res.ok),
    execution_time: (res && res.execution_time) || (performance.now() - t0) / 1000,
    results: (res && res.result_count) || 0,
    at: new Date().toISOString().slice(0, 19),
  });
  renderHistory();
});

for (const b of document.querySelectorAll(".suggest")) {
  b.addEventListener("click", () => { $("q").value = b.dataset.q; });
}
$("clear").addEventListener("click", () => { history_.length = 0; renderHistory(); });
refreshStatus();
</script>
</body>
</html>
"""
