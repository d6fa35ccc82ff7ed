#!/usr/bin/env node
// E2E drive of the /tables pivot workspace's INLINE JS — the one part
// of the serving surface no ScalaTest executes (specs assert the HTML
// text; this actually RUNS the script). Recipe:
//
//   sbt "runMain graft.tools.TablesDemo"        # prints TABLES_DEMO_PORT
//   curl -s http://127.0.0.1:$PORT/tables/trades_raw | \
//     sed -n 's/.*<script>//;s,</script>.*,,p' > /tmp/table_page.js   # or any extractor
//   GRAFT_GW_PORT=$PORT node tools/drive_table_page.js
//
// Runs the page script in a `vm` context under a minimal DOM shim,
// then drives it against the LIVE gateway: initial grid render,
// group-by pivot with sum (verified against an independent reduce of
// the JSON data plane), conjunctive filter + count, and the stored-XSS
// escape path (a hostile cell value must arrive entity-escaped).
// Prints TABLE_PAGE_DRIVE_OK on success, exits 1 on any failure.
'use strict';
const fs = require('fs');
const vm = require('vm');
const PORT = process.env.GRAFT_GW_PORT || '44941';
const js = fs.readFileSync('/tmp/table_page.js', 'utf8');

const els = new Map();
function el(id) {
  if (!els.has(id)) els.set(id, {value: '', innerHTML: '', onclick: null});
  return els.get(id);
}
let intervalFn = null;
const ctx = {
  document: {getElementById: el, querySelectorAll: () => []},
  fetch: (p) => fetch('http://127.0.0.1:' + PORT + p),
  setInterval: (f, ms) => { intervalFn = f; return 0; },
  console, JSON, Number, String, Math, isNaN, Promise,
};
vm.createContext(ctx);
vm.runInContext(js + '\n;globalThis.__t = {state, tick, render, pivot, applyFilter};', ctx);

(async () => {
  // initial tick() was kicked off at script end — poll for the grid
  // rather than sleeping a fixed beat (a cold gateway >400 ms would
  // otherwise fail the first assert spuriously; review r12)
  const deadline = Date.now() + 15000;
  while (!el('t').innerHTML.includes('<table') && Date.now() < deadline)
    await new Promise(r => setTimeout(r, 100));
  const t = ctx.__t;
  const assert = (cond, msg) => { if (!cond) { console.error('FAIL: ' + msg); process.exit(1); } };

  // 1. initial grid rendered from live data
  let grid = el('t').innerHTML;
  assert(grid.includes('<table'), 'grid table rendered');
  assert(grid.includes('AAPL') && grid.includes('MSFT'), 'raw rows present');
  assert(el('ctl').innerHTML.includes('group'), 'controls rendered');

  // 2. group-by symbol + sum(qty): verify against an independent reduce
  const data = await (await fetch('http://127.0.0.1:' + PORT + '/api/v1/table/trades_raw')).json();
  t.state.groupBy = ['symbol']; t.state.agg = 'sum'; t.state.aggCol = 'qty';
  await t.tick();
  grid = el('t').innerHTML;
  const expect = {};
  for (const r of data) expect[r.symbol] = (expect[r.symbol] || 0) + r.qty;
  for (const [sym, tot] of Object.entries(expect))
    assert(new RegExp(sym + '[\\s\\S]{0,80}>' + tot + '<').test(grid),
      `sum(qty) for ${sym} = ${tot} in grid`);

  // 3. filter: side == buy, count — check count matches
  t.state.groupBy = ['side']; t.state.agg = 'count'; t.state.aggCol = '';
  t.state.filterCol = 'side'; t.state.filterOp = '=='; t.state.filterVal = 'buy';
  await t.tick();
  grid = el('t').innerHTML;
  const buys = data.filter(r => r.side === 'buy').length;
  assert(grid.includes('buy') && grid.includes('>' + buys + '<'),
    `filtered count ${buys} rendered`);
  assert(!grid.includes('sell'), 'filter excludes sell');

  // 4. XSS hardening: a hostile value must arrive escaped
  const hostile = '<img src=x onerror=alert(1)>';
  t.state.filterCol = ''; t.state.groupBy = []; t.state.limit = 500;
  ctx.fetch = async () => ({json: async () => [{symbol: hostile, qty: 1}]});
  await t.tick();
  grid = el('t').innerHTML;
  assert(!grid.includes('<img'), 'hostile cell is escaped');
  assert(grid.includes('&lt;img'), 'escaped form present');

  console.log('TABLE_PAGE_DRIVE_OK: grid render, pivot sum, filter count, XSS escape');
})().catch(e => { console.error('FAIL:', e); process.exit(1); });
