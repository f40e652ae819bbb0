"""Reference-parity constants.

The reference hard-codes a user-id cutoff per program (SURVEY.md §2.7.5):

- ``SocialTriangle_RS.java:32``   → ``MAX = 50000``, strict ``<``, both
  endpoints, both join inputs.
- ``ReplicatedJoinDriver.java:31`` → ``MAX = 40000``, non-strict ``<=``,
  both endpoints, **cache (broadcast) side only** — the probe input is not
  filtered.
- ``ApproxCardinality.java:24``   → ``MAX = 7812500``, strict ``<``, both
  endpoints.
- ``ExactCardinality``            → no filter.

The driver's testdata derives edges over ids in ``[0, 200)`` at the low end
(FIXTURES.md §1), so the engine's registered queries use scaled cutoffs that
play the same role relative to the id range; strictness per program is
preserved exactly. The operators themselves take ``max_id``/``strict`` as
parameters — one engine codepath, four configurations, replacing the
reference's copy-per-program structure.
"""

#: plays the role of SocialTriangle_RS's 50,000 (strict <)
TRIANGLE_RS_MAX = 150

#: plays the role of ReplicatedJoinDriver's 40,000 (non-strict <=, cache side only)
REPLICATED_MAX = 120

#: plays the role of ApproxCardinality's 7,812,500 (strict <)
APPROX_MAX = 180
