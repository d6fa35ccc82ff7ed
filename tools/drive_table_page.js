#!/usr/bin/env node
// E2E drive of the /tables pivot workspace's INLINE JS — the one part
// of the serving surface no ScalaTest executes (specs assert the HTML
// text; this actually RUNS the script). Recipe:
//
//   sbt "runMain graft.tools.TablesDemo"        # prints TABLES_DEMO_PORT
//   curl -s http://127.0.0.1:$PORT/tables/trades_raw -o /tmp/page.html
//   python3 -c "import re; open('/tmp/table_page.js','w').write(
//     re.search(r'<script>(.*)</script>', open('/tmp/page.html').read(),
//     re.S).group(1))"     # the page script spans lines — regex, not line-sed
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
vm.runInContext(js + '\n;globalThis.__t = {state, tick, render, pivot, applyFilter, setExprs, withComputed, rebuildControls};', ctx);

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

  // 4. split_by crosstab (the Perspective split_by pivot): group by
  // side, split by symbol, sum(qty) — every (side, symbol) cell must
  // equal an independent reduce, and the crosstab headers must name
  // each split value
  t.state.groupBy = ['side']; t.state.splitBy = 'symbol';
  t.state.agg = 'sum'; t.state.aggCol = 'qty';
  t.state.filterCol = ''; t.state.filterVal = '';
  await t.tick();
  grid = el('t').innerHTML;
  const cell = {};
  const sides = new Set(), symbols = new Set();
  for (const r of data) {
    sides.add(r.side); symbols.add(r.symbol);
    cell[r.side + '|' + r.symbol] = (cell[r.side + '|' + r.symbol] || 0) + r.qty;
  }
  for (const sym of symbols)
    assert(grid.includes('>sum(qty) | ' + sym + '<'), `crosstab header for ${sym}`);
  for (const side of sides) {
    // the row for this side must carry each symbol's sum — a (side,
    // symbol) combo with no rows must render null — in split-value
    // (sorted) column order
    const syms = Array.from(symbols).sort();
    const want = syms.map(s =>
      cell[side + '|' + s] === undefined ? 'null' : cell[side + '|' + s]);
    const rowRe = new RegExp('>' + side + '<' + want.map(v =>
      '[\\s\\S]{0,40}>' + v + '<').join(''));
    assert(rowRe.test(grid), `crosstab row for ${side}: ` + want.join(','));
  }

  // 5. computed expression columns (the ExprTK analogue): define
  // notional = qty * price, aggregate sum(notional) by symbol, check
  // against an independent reduce (shared rounding: both sides sum
  // doubles in row order per group, compare at 1e-6 rel tolerance)
  t.setExprs('notional = "qty" * "price"');
  t.state.groupBy = ['symbol']; t.state.splitBy = '';
  t.state.agg = 'sum'; t.state.aggCol = 'notional';
  await t.tick();
  grid = el('t').innerHTML;
  const notion = {};
  for (const r of data) notion[r.symbol] = (notion[r.symbol] || 0) + r.qty * r.price;
  for (const [sym, tot] of Object.entries(notion)) {
    const m = new RegExp('>' + sym + '<[\\s\\S]{0,40}>([0-9.eE+-]+)<').exec(grid);
    assert(m, `expression sum row for ${sym}`);
    const got = Number(m[1]);
    assert(Math.abs(got - tot) <= 1e-6 * Math.max(1, Math.abs(tot)),
      `sum(notional) for ${sym}: page ${got} vs reduce ${tot}`);
  }
  // malformed expression: setExprs must throw (the page's apply path
  // surfaces the message in #err and leaves state unchanged)
  let threw = false;
  try { t.setExprs('bad = "qty" **'); } catch (e) { threw = true; }
  assert(threw, 'malformed expression rejected');
  t.setExprs('');

  // 6. XSS hardening: a hostile value must arrive escaped
  const hostile = '<img src=x onerror=alert(1)>';
  t.state.filterCol = ''; t.state.groupBy = []; t.state.limit = 500;
  ctx.fetch = async () => ({json: async () => [{symbol: hostile, qty: 1}]});
  await t.tick();
  grid = el('t').innerHTML;
  assert(!grid.includes('<img'), 'hostile cell is escaped');
  assert(grid.includes('&lt;img'), 'escaped form present');

  // 7. apply must NOT wipe prior configuration on rebuild (advisor
  // r13): emulate the browser faithfully — assigning ctl.innerHTML
  // rebuilds the controls AT THEIR DEFAULTS — then click apply twice
  // and require the second apply to read values RESTORED from state
  // by syncControls(), not the reset defaults.
  const DEFAULTS = {sb: '', agg: 'count', aggc: '', fc: '', fop: '==',
                    fv: '', lim: '500', vw: 'grid', ex: ''};
  const gbEl = el('gb');
  gbEl.options = ['symbol', 'qty', 'side'].map(v => ({value: v, selected: false}));
  Object.defineProperty(gbEl, 'selectedOptions',
    {get: () => gbEl.options.filter(o => o.selected), configurable: true});
  const ctl = el('ctl');
  let ctlHtml = ctl.innerHTML;
  Object.defineProperty(ctl, 'innerHTML', {
    get: () => ctlHtml,
    set: (v) => {
      ctlHtml = v;
      for (const [id, d] of Object.entries(DEFAULTS)) el(id).value = d;
      for (const o of gbEl.options) o.selected = false;
    },
    configurable: true,
  });
  // the user configures the controls and applies
  gbEl.options[0].selected = true; // group by symbol
  el('agg').value = 'sum'; el('aggc').value = 'qty';
  el('lim').value = '25'; el('vw').value = 'grid'; el('ex').value = '';
  el('apply').onclick();
  assert(t.state.groupBy.join() === 'symbol' && t.state.limit === 25,
    'first apply read the controls');
  // second apply with UNTOUCHED controls: the rebuild between the two
  // applies must have restored every control from state
  el('apply').onclick();
  assert(t.state.groupBy.join() === 'symbol', 'second apply preserves groupBy');
  assert(t.state.limit === 25, 'second apply preserves limit');
  assert(t.state.agg === 'sum' && t.state.aggCol === 'qty',
    'second apply preserves agg/aggCol');

  // 8. stale select value survives a rebuild (advisor r14): emulate
  // the BROWSER's select semantics — assigning a value with no
  // matching option silently resets to '' — and require syncControls
  // to re-add the stale choice as an explicit option instead of
  // letting the NEXT apply persist the wipe into state.
  const sb = el('sb');
  sb.options = [{value: ''}, {value: 'symbol'}, {value: 'side'}];
  let sbVal = '';
  Object.defineProperty(sb, 'value', {
    get: () => sbVal,
    set: (v) => { sbVal = sb.options.some(o => o.value === v) ? String(v) : ''; },
    configurable: true,
  });
  sb.appendChild = (o) => sb.options.push(o);
  ctx.document.createElement = () => ({});
  t.state.splitBy = 'notional'; // an expr column the rebuild dropped
  t.rebuildControls();
  assert(sb.value === 'notional', 'stale splitBy re-added as an option');
  el('apply').onclick();
  assert(t.state.splitBy === 'notional',
    'state.splitBy survives the rebuild (no silent wipe on next apply)');

  console.log('TABLE_PAGE_DRIVE_OK: grid render, pivot sum, filter count, split_by crosstab, expression column, XSS escape, apply preserves config, stale select kept');
})().catch(e => { console.error('FAIL:', e); process.exit(1); });
