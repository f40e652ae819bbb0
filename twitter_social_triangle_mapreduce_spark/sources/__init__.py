from .io import (  # noqa: F401
    EDGES_FROM_EVENTS_SQL,
    derive_edges,
    edges_from_events,
    load_table,
    read_edges_csv,
    write_tsv,
)
