#!/usr/bin/env python3
"""Deterministic Calabrio-shaped JSON fixtures (FIXTURES.md §A).

Dev tooling only (like tools/check.py) — runtime code is pure Scala.
Writes fixtures/*.json, committed to the repo; both the Spark side
(spark.read.json) and the DuckDB oracle (read_json) consume the same
files. Seeded — re-running reproduces byte-identical output.

Shapes are exactly the JSON paths the reference transform reads
(/root/reference/sql_templates/Update Calabrio Tables from Staging
Tables (D_POST_INSTALL).sql); edge cases per FIXTURES.md:
  - forms with empty sections/questions/options (inner-flatten drops)
  - duplicate contact ids across files (insert-only merge J2)
  - DST-straddling startTime values (America/Denver conversion)
  - exact-duplicate evaluation objects (dedup-to-1 W1)
  - non-SCORED evaluations (filter F1), NULL evaluator (trouble probe)
  - comments with empty history (L3), multi-entry history (W2),
    no-alnum text (P9 drop), section-level comments (NULL questionFK)
All floats are 0.25 multiples → exact in IEEE754, no cross-engine
parse drift. Digit runs in URLs appear only where the reference's
regexes expect them (hosts contain no digits).
"""
import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures"
OUT.mkdir(exist_ok=True)
rng = random.Random(20260812)

HOST = "https://calabriocloud.example"  # no digits anywhere in the host

# ---------------------------------------------------------------- forms
forms = []
for f in range(1, 9):
    sections = []
    for s in range(f % 4):  # form 4 and 8 have zero sections (dropped by L1)
        questions = []
        for q in range((f + s) % 5):  # some sections have zero questions
            options = []
            for o in range((f + s + q) % 4 + (0 if q % 3 else 1)):
                options.append({
                    "id": f * 100000 + s * 1000 + q * 10 + o,
                    "label": f"Option {o} of q{q}",
                    "points": (o * 5) % 20,
                    "type": "KPI" if (f + q + o) % 5 == 0 else "Standard",
                })
            questions.append({
                "id": f * 10000 + s * 100 + q,
                "text": f"Question {q} in section {s}?",
                "weight": ((f + q) % 8) * 0.25,
                "options": options,
            })
        sections.append({
            "id": f * 1000 + s,
            "name": f"Section {s}",
            "weight": ((f + s) % 4) * 0.25 + 0.25,
            "questions": questions,
        })
    forms.append({"id": f, "name": f"Eval Form {f}", "sections": sections})

# ------------------------------------------------------------- contacts
# DST edges for America/Denver in 2024: spring-forward Mar 10 09:00 UTC,
# fall-back Nov 3 08:00 UTC. Mix those with ordinary instants.
DST_EDGE_MS = [
    1710061140000,  # 2024-03-10 08:59 UTC -> 01:59 MST
    1710064860000,  # 2024-03-10 10:01 UTC -> 03:01 MDT (02:xx skipped)
    1730620740000,  # 2024-11-03 07:59 UTC -> 01:59 MDT
    1730624460000,  # 2024-11-03 09:01 UTC -> 02:01 MST
]

def mk_contact(cid):
    ms = (DST_EDGE_MS[cid % 4] if cid % 7 == 0
          else 1704067200000 + (cid * 9973) % 31536000 * 1000)
    c = {
        "id": cid,
        "startTime": ms,
        "assocCallId": None if cid % 11 == 0 else f"CJP-{cid:08d}",
        # extra fields the SQL never reads — proves tolerant parsing
        "agent": {"$ref": f"{HOST}/api/rest/person/{7000 + cid % 50}",
                  "displayId": f"agent{cid % 50}"},
    }
    return c

all_contacts_1 = [mk_contact(1000 + i) for i in range(60)]
# file 2 overlaps ids 1040..1059 byte-identically (J2 insert-only dedup)
all_contacts_2 = [mk_contact(1040 + i) for i in range(60)]
qa_contact_ids = [1000 + i for i in range(0, 80, 2)]  # 40 scored contacts
qa_contacts = [mk_contact(c) for c in qa_contact_ids]

# ---------------------------------------------------------- evaluations
evals = []
form_ids_with_questions = [f["id"] for f in forms if any(
    q for s in f["sections"] for q in s["questions"])]
for e in range(40):
    eid = 5000 + e
    cid = qa_contact_ids[e % len(qa_contact_ids)]
    fid = form_ids_with_questions[e % len(form_ids_with_questions)]
    form = next(f for f in forms if f["id"] == fid)
    sections = []
    if e % 9 != 7:  # some evals have no sections at all (L2 inner drop)
        for s in form["sections"]:
            qs = [{"id": q["id"],
                   "selectedOption": (q["options"][e % len(q["options"])]["id"]
                                      if q["options"] else None)}
                  for q in s["questions"]]
            sections.append({"id": s["id"], "questions": qs})
    ev = {
        "id": eid,
        "qualityRef": f"{HOST}/api/rest/recording/contact/{cid}",
        "evalForm": {"evalFormId": fid},
        "agent": {"id": 7000 + e % 50},
        "evaluator": None if e % 10 == 3 else {"id": 8000 + e % 7},
        "isScoreCounted": e % 3 != 0,
        "evaluated": 1704153600000 + e * 86400000 + (e * 997) % 86400000,
        "state": {"text": "SCORED" if e % 5 != 4 else "IN_PROGRESS"},
        "responseState": {"text": "AGREED" if e % 4 else "NONE"},
        "additiveScore": (e * 7) % 100,
        "totalScore": ((e * 13) % 400) * 0.25,
        "sections": sections,
    }
    if e % 3 == 0:
        ev["comments"] = f"/api/rest/recording/contact/{cid}/eval/{eid}/comment"
    evals.append(ev)
    if e % 8 == 5:  # exact duplicate object in staging (W1 dedup-to-1)
        evals.append(json.loads(json.dumps(ev)))
rng.shuffle(evals)

# ----------------------------------------------- restated pull (D1/J3)
# A newer extraction window covering the first 10 QA contacts: most of
# their evals re-appear with updated scores (J3 update keeping old
# evaluated_date), eval 5020 vanished upstream (D1 delete), and two new
# evals appear (J3 insert).
restated_cids = qa_contact_ids[:10]
qa_contacts_restated = [mk_contact(c) for c in restated_cids]
evals_restated = []
seen = set()
for ev in evals:
    cid = int(ev["qualityRef"].rsplit("/", 1)[1])
    if cid in restated_cids and ev["id"] not in seen and ev["id"] != 5020:
        seen.add(ev["id"])
        nv = json.loads(json.dumps(ev))
        nv["totalScore"] = ev["totalScore"] + 1.25
        nv["additiveScore"] = ev["additiveScore"] + 1
        nv["evaluated"] = ev["evaluated"] + 86400000  # must NOT overwrite
        evals_restated.append(nv)
for k, e in enumerate((90, 91)):  # brand-new evaluations
    cid = restated_cids[k]
    evals_restated.append({
        "id": 5000 + e,
        "qualityRef": f"{HOST}/api/rest/recording/contact/{cid}",
        "evalForm": {"evalFormId": form_ids_with_questions[0]},
        "agent": {"id": 7000 + e}, "evaluator": {"id": 8000 + e % 7},
        "isScoreCounted": True,
        "evaluated": 1706745600000 + e * 1000,
        "state": {"text": "SCORED"},
        "responseState": {"text": "AGREED"},
        "additiveScore": 50 + e, "totalScore": 80.25,
        "sections": [],
    })

# ------------------------------------------------------------- comments
comments = []
for m in range(90):
    mid = 90000 + m
    e = m % 40
    eid = 5000 + e
    cid = qa_contact_ids[e % len(qa_contact_ids)]
    created = 1704240000000 + m * 3600000
    history = []
    for h in range(m % 4):  # 0..3 history entries; distinct created values
        history.append({
            "created": created + (h + 1) * 60000,
            "commentor": {"$ref": f"{HOST}/api/rest/person/{8100 + (m + h) % 9}"},
        })
    comments.append({
        "$ref": f"{HOST}/api/rest/recording/contact/{cid}/eval/{eid}/comment/{mid}",
        "sectionFK": 1000 * (e % 7 + 1) + m % 3,
        "questionFK": None if m % 5 == 2 else 10000 * (e % 7 + 1) + m % 4,
        "created": created,
        "commentor": {"$ref": f"{HOST}/api/rest/person/{8200 + m % 11}"},
        "text": ("...!?." if m % 13 == 8 else  # no alnum -> dropped (P9)
                 f"Comment {m} on eval {eid}: needs follow-up"),
        "history": history,
    })

# ---------------------------------------------------------- transcripts
transcripts = []
for t in range(20):
    cid = qa_contact_ids[t % len(qa_contact_ids)]
    n = t % 4  # some empty responses (skipped at extraction, F6)
    transcripts.append([{"ccrid": cid, "seq": i,
                         "text": f"utterance {i} of call {cid}"}
                        for i in range(n)])

def dump(name, obj):
    p = OUT / name
    p.write_text(json.dumps(obj, indent=1, sort_keys=True) + "\n")
    print(f"wrote {p} ({len(obj)} top-level items)")

dump("forms.json", forms)
dump("all_contacts_1.json", all_contacts_1)
dump("all_contacts_2.json", all_contacts_2)
dump("qa_contacts.json", qa_contacts)
dump("evals.json", evals)
dump("qa_contacts_restated.json", qa_contacts_restated)
dump("evals_restated.json", evals_restated)
dump("comments.json", comments)
dump("transcripts.json", transcripts)

# Malformed-load fixtures (S10 PERMISSIVE / skip-file behavior)
bad = OUT / "malformed"
bad.mkdir(exist_ok=True)
(bad / "all_contacts_bad.json").write_text('[{"id": 999, "startTime": ]broken\n')
(bad / "concatenated_arrays.json").write_text(
    '[{"id": 1, "v": "a"}]\n[{"id": 2, "v": "b"}]\n')  # _fix_file input shape
print("wrote malformed fixtures")
