#!/usr/bin/env python3
"""Serving-surface mutation campaign (r13 verdict task 1 — wave 3).

The r13 campaign proved the ORACLE gate's teeth wall-to-wall; the
serving layer — REST response shaping in `server/Gateway.scala`,
WebSocket fanout/subscriptions in `server/WebSocketServer.scala`,
`next`/lookup semantics in `streaming/ChannelRuntime.scala` — is
guarded only by the ScalaTest suite, whose sensitivity was exactly as
unproven as the oracle corpus' before r13. This harness seeds
single-site mutations of those paths (each the shape of a bug a human
writes: a 404 flipped to 200, a dropped identity filter, a broken
unsubscribe, a future resolved with the previous tick) and scores each
by `sbt test`:

  1. PREFILTER: the serving-focused suites (fast, the tests most
     likely to see the bug). Any failure -> KILLED.
  2. ESCALATE: a prefilter-green mutant runs the FULL `sbt test`.
     Still green -> SURVIVED — a finding about the suite, not a pass:
     the survivor gets a new e2e test before the round closes.

Reference contract being guarded: tests/server/web/test_webserver.py
(the reference's 82-844 route-shape assertions).

Usage (from a dedicated worktree, same discipline as mutate.py):
  git worktree add /tmp/graft_smut HEAD
  python3 tools/mutate_serving.py --worktree /tmp/graft_smut \
      --out receipts/mutants_w3.jsonl [--ids s01,...]
"""
import argparse, json, os, subprocess, sys, time

GW = "src/main/scala/graft/server/Gateway.scala"
WS = "src/main/scala/graft/server/WebSocketServer.scala"
CR = "src/main/scala/graft/streaming/ChannelRuntime.scala"

# (id, file, old, new, note); `old` must occur EXACTLY once.
MUTANTS = [
    ("s01_unknown_route_200", GW,
     '''          }, "graft-shutdown").start()
        case _ => respond(ex, 404, """{"detail":"Not Found"}""")''',
     '''          }, "graft-shutdown").start()
        case _ => respond(ex, 200, """{"detail":"Not Found"}""")''',
     "unknown REST route answers 200 instead of 404 (reference 404 rule)"),
    ("s02_identity_filter_anon_leak", GW,
     "case (Some(_), None) => Nil // auth-filtered channel, anonymous caller",
     "case (Some(_), None) => rows // auth-filtered channel, anonymous caller",
     "X13: anonymous caller of an auth-filtered channel sees EVERY row"),
    ("s03_identity_filter_wrong_row", GW,
     "if (i < 0) rows else rows.filter(r => !r.isNullAt(i) && String.valueOf(r.get(i)) == id)",
     "if (i < 0) rows else rows.filter(r => !r.isNullAt(i) && String.valueOf(r.get(i)) != id)",
     "X13: row filter INVERTED — caller sees everyone's rows except their own"),
    ("s04_basket_last_no_404", GW,
     '''          if (!keyDeclared(name, key))
            respond(ex, 404, s"""{"detail":"Channel not found: $name/$key"}""")
          else {
            val observed = runtime.lastByBasketKey(name).collectFirst {''',
     '''          if (false)
            respond(ex, 404, s"""{"detail":"Channel not found: $name/$key"}""")
          else {
            val observed = runtime.lastByBasketKey(name).collectFirst {''',
     "/last/{ch}/{key}: an undeclared basket key no longer 404s"),
    ("s05_send_422_as_200", GW,
     '''            case e: IllegalArgumentException =>
              respond(ex, 422, s"""{"detail":${mapper.writeValueAsString(e.getMessage)}}""")
          }
        // static-field routes (reference MountFieldRestRoutes,''',
     '''            case e: IllegalArgumentException =>
              respond(ex, 200, s"""{"detail":${mapper.writeValueAsString(e.getMessage)}}""")
          }
        // static-field routes (reference MountFieldRestRoutes,''',
     "/send validation failure answers 200 instead of 422"),
    ("s06_send_identity_forall", GW,
     "              case Some(id) if maps.forall(m =>\n"
     "                m.get(field).exists(v => String.valueOf(v) == id)) => ()",
     "              case Some(id) if maps.forall(m =>\n"
     "                m.get(field).forall(v => String.valueOf(v) == id)) => ()",
     "X13 write validation: a row OMITTING the auth field slips past"),
    ("s07_send_key_not_injected", GW,
     "              case (Some(col), Some(k)) => m + (col -> k)",
     "              case (Some(col), Some(k)) => m",
     "/send/{ch}/{key}: the path key is no longer injected as the basket key column"),
    ("s08_table_dropped_auth_leak", GW,
     "                case Some(_) => Nil\n              }",
     "                case Some(_) => rawRows\n              }",
     "K4 tables: a view whose projection dropped the auth field leaks every row"),
    ("s09_ws_unsubscribe_noop", WS,
     '          case "unsubscribe" => conn.subs.remove((channel, key))',
     '          case "unsubscribe" => ()',
     "WS per-key unsubscribe is a no-op — frames keep flowing"),
    ("s10_ws_fanout_ignores_subs", WS,
     "        val wantAll = subs.contains((ch, None))",
     "        val wantAll = true",
     "WS fanout ignores the subscription set — every conn gets every channel"),
    ("s11_ws_identity_any", WS,
     "          identity.exists { id =>\n"
     "            val i = schema.fieldNames.indexOf(field)\n"
     "            i >= 0 && !r.isNullAt(i) && String.valueOf(r.get(i)) == id\n"
     "          }",
     "          identity.isDefined",
     "WS identity filter: ANY authenticated identity sees every row"),
    ("s12_next_resolves_previous", CR,
     "  def next(name: String): Future[Option[Row]] = {\n"
     "    val p = Promise[Option[Row]]()\n"
     "    chan(name).nextWaiters.add(p)\n"
     "    p.future\n"
     "  }",
     "  def next(name: String): Future[Option[Row]] = {\n"
     "    val p = Promise[Option[Row]]()\n"
     "    p.trySuccess(last(name))\n"
     "    p.future\n"
     "  }",
     "T6 next: future resolves immediately with the PREVIOUS tick"),
    ("s13_next_by_key_any_key", CR,
     "        rows.find(r => !r.isNullAt(i) && String.valueOf(r.get(i)) == key)",
     "        rows.find(r => !r.isNullAt(i))",
     "T6 per-key next: ANY key's tick resolves the future"),
    ("s14_whoami_anon_200", GW,
     '''            case None if simpleAuthUsers.nonEmpty =>
              respond(ex, 401, """{"detail":"Session not found"}""")''',
     '''            case None if simpleAuthUsers.nonEmpty =>
              respond(ex, 200, """{"detail":"Session not found"}""")''',
     "/whoami without a session answers 200 instead of 401"),
]

# Prefilter: serving-focused suites, most likely to see these bugs.
PREFILTER_SUITES = [
    "graft.GatewaySpec", "graft.GraftGatewaySpec", "graft.WebSocketSpec",
    "graft.GatewayClientSpec", "graft.GatewayTestHarnessSpec",
    "graft.ServerMiddlewareSpec", "graft.ChannelRuntimeSpec",
    "graft.ViewServerDeltaSpec",
]


def sh(cmd, cwd=None, timeout=None):
    return subprocess.run(cmd, shell=isinstance(cmd, str), cwd=cwd,
                          capture_output=True, text=True, timeout=timeout)


def apply_mutant(worktree, m):
    _id, relpath, old, new, _note = m
    path = os.path.join(worktree, relpath)
    src = open(path).read()
    n = src.count(old)
    if n != 1:
        raise RuntimeError(f"{_id}: site occurs {n} times (need exactly 1) in {relpath}")
    open(path, "w").write(src.replace(old, new))


def revert(worktree, relpath):
    subprocess.run(["git", "checkout", "--", relpath], cwd=worktree, check=True)


def failing_tests(output):
    return [l.strip() for l in output.splitlines()
            if l.strip().startswith("[info] - ") and "*** FAILED ***" in l]


def run_one(worktree, m, full_on_green):
    _id, relpath, old, new, note = m
    rec = {"id": _id, "file": relpath, "note": note, "old": old, "new": new}
    t0 = time.time()
    apply_mutant(worktree, m)
    try:
        pre = sh(f"sbt -batch \"testOnly {' '.join(PREFILTER_SUITES)}\"",
                 cwd=worktree, timeout=3600)
        fails = failing_tests(pre.stdout)
        if pre.returncode != 0 or fails:
            rec.update(status="KILLED", stage="prefilter",
                       n_fail=len(fails), killed_by=fails[:10])
            if not fails:  # rc!=0 without parsed failures: compile error etc.
                rec["detail"] = (pre.stdout + pre.stderr)[-800:]
                rec["kill_mode"] = "suite_crash"
            return rec
        if not full_on_green:
            rec.update(status="SURVIVED", stage="prefilter")
            return rec
        full = sh("sbt -batch test", cwd=worktree, timeout=5400)
        fails = failing_tests(full.stdout)
        if full.returncode != 0 or fails:
            rec.update(status="KILLED", stage="full",
                       n_fail=len(fails), killed_by=fails[:10])
            if not fails:
                rec["detail"] = (full.stdout + full.stderr)[-800:]
                rec["kill_mode"] = "suite_crash"
            return rec
        rec.update(status="SURVIVED", stage="full")
        return rec
    finally:
        revert(worktree, relpath)
        rec["secs"] = round(time.time() - t0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worktree", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ids", default="")
    ap.add_argument("--no-escalate", action="store_true",
                    help="stop at the prefilter (quick pass; survivors "
                         "still need the full-suite run before they count)")
    ap.add_argument("--suites", default="",
                    help="comma-separated override of the prefilter suites "
                         "(e.g. re-scoring codec-parity mutants against "
                         "graft.MultimodalSpec)")
    ap.add_argument("--mutants-from", default="",
                    help="JSONL file of {id,file,old,new,note} records to "
                         "score instead of the built-in MUTANTS list "
                         "(e.g. suite-scoring tools/mutgen.py survivors)")
    args = ap.parse_args()
    if args.suites:
        global PREFILTER_SUITES
        PREFILTER_SUITES = [s for s in args.suites.split(",") if s]
    global MUTANTS
    if args.mutants_from:
        MUTANTS = [(r["id"], r["file"], r["old"], r["new"], r.get("note", ""))
                   for r in map(json.loads, open(args.mutants_from))]
    ids = set(x for x in args.ids.split(",") if x)
    todo = [m for m in MUTANTS if not ids or m[0] in ids]
    dirty = sh(["git", "status", "--porcelain"], cwd=args.worktree).stdout.strip()
    if dirty:
        print(f"worktree dirty:\n{dirty}", file=sys.stderr)
        sys.exit(2)
    # environment precheck (the mutate.py discipline): the UNMUTATED
    # tree must pass the prefilter suites before any mutant is scored
    pre = sh(f"sbt -batch \"testOnly {' '.join(PREFILTER_SUITES)}\"",
             cwd=args.worktree, timeout=3600)
    if pre.returncode != 0 or failing_tests(pre.stdout):
        print("PRECHECK FAILED — suites red on the unmutated tree:", file=sys.stderr)
        print((pre.stdout + pre.stderr)[-1200:], file=sys.stderr)
        sys.exit(3)
    print("== precheck clean (prefilter suites green on unmutated tree)", flush=True)
    for m in todo:
        print(f"== {m[0]} ({m[4]})", flush=True)
        try:
            rec = run_one(args.worktree, m, full_on_green=not args.no_escalate)
        except Exception as e:
            rec = {"id": m[0], "status": "HARNESS_ERROR", "detail": str(e)}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"   -> {rec.get('status')} [{rec.get('stage', '-')}] "
              f"n_fail={rec.get('n_fail', '-')}", flush=True)


if __name__ == "__main__":
    main()
