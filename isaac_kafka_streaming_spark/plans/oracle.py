"""DuckDB-side SQL fragments matching plans.views derivations exactly.

Each constant is a SELECT (usable as a CTE body) over the driver's
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings).  Any change to plans.views MUST
be mirrored here — tests/test_oracle_parity.py enforces it by running
both sides at sf0.001/sf0.01 and comparing values exactly.

Engine-compat notes baked into these fragments:
- DuckDB CAST(double AS INT) rounds, Spark truncates -> FLOOR first.
- DuckDB date_trunc('day', ts) yields DATE -> queries use CAST(ts AS DATE)
  on both sides when bucketing by day.
- DuckDB regexp_replace needs the 'g' flag for global replacement
  (Spark is global by default).
- epoch_ms(ts) (DuckDB) == unix_millis(ts) (Spark): both truncate to ms.
"""

LOGGED_EVENTS = """
SELECT event_id,
       user_id,
       event_type,
       ts,
       (user_id % 10 = 0) AS anonymous_user,
       value,
       props
FROM events
"""

REGISTERED_EVENTS = """
SELECT * FROM logged_events WHERE NOT anonymous_user
"""

ANONYMOUS_EVENTS = """
SELECT * FROM logged_events WHERE anonymous_user
"""

USERS = """
SELECT c_custkey AS user_id,
       c_mktsegment AS role,
       CASE WHEN c_custkey % 2 = 0 THEN 'MALE' ELSE 'FEMALE' END AS gender,
       n_name AS nation,
       c_acctbal AS acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""

QUESTION_ATTEMPTS = """
SELECT event_id,
       user_id,
       'q' || CAST(CAST(FLOOR(value) AS INT) % 20 AS VARCHAR) AS question_page_id,
       'p' || CAST(CAST(FLOOR(value) AS INT) % 3 AS VARCHAR) AS question_part_id,
       'q' || CAST(CAST(FLOOR(value) AS INT) % 20 AS VARCHAR) || '|' ||
       'p' || CAST(CAST(FLOOR(value) AS INT) % 3 AS VARCHAR) AS question_id,
       (value > 50) AS correct,
       ts AS date_attempted
FROM registered_events
"""

QUESTIONS = """
SELECT question_page_id,
       COUNT(DISTINCT question_part_id) AS question_part_count,
       CAST(SUBSTR(question_page_id, 2, 10) AS INT) % 6 + 1 AS level
FROM question_attempts
GROUP BY question_page_id
"""


def with_views(body: str, *views: str) -> str:
    """Compose a query over the derived views it needs.

    ``views`` are names among {logged_events, registered_events,
    anonymous_events, users, question_attempts, questions}; dependency
    order is handled here so callers just list what they reference.
    """
    defs = {
        "logged_events": (LOGGED_EVENTS, []),
        "registered_events": (REGISTERED_EVENTS, ["logged_events"]),
        "anonymous_events": (ANONYMOUS_EVENTS, ["logged_events"]),
        "users": (USERS, []),
        "question_attempts": (QUESTION_ATTEMPTS, ["registered_events"]),
        "questions": (QUESTIONS, ["question_attempts"]),
    }
    ordered: list[str] = []

    def add(name: str) -> None:
        if name in ordered:
            return
        for dep in defs[name][1]:
            add(dep)
        ordered.append(name)

    for v in views:
        add(v)
    if not ordered:
        return body
    ctes = ",\n".join(f"{name} AS ({defs[name][0]})" for name in ordered)
    stripped = body.lstrip()
    if stripped.upper().startswith("WITH"):
        # splice the body's own CTE list onto ours
        return f"WITH {ctes},\n{stripped[4:]}"
    return f"WITH {ctes}\n{body}"
