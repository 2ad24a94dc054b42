"""Property test (no Spark): the streaming operator's interval-merge
must be order-insensitive and must equal a brute-force single-pass
sessionization of the same events — the invariant that makes the
streaming result independent of micro-batch arrival order."""

from hypothesis import given, settings
from hypothesis import strategies as st

from amundsendatabuilder_spark.streaming.sessions import _merge_intervals

GAP = 100


def _brute(events):
    """Sessionize sorted point events with the batch rule (> GAP splits)."""
    out = []
    for t, c in sorted(events):
        if out and t - out[-1][1] <= GAP:
            s = out[-1]
            s[1] = max(s[1], t)
            s[2] += 1
            s[3] += c
        else:
            out.append([t, t, 1, c])
    return out


events_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2000),
              st.integers(min_value=-100, max_value=100)),
    min_size=0, max_size=60,
)


@given(events_strategy, st.data())
@settings(max_examples=200, deadline=None)
def test_merge_equals_brute_force_any_arrival_order(events, data):
    # arbitrary split of the events into "micro-batches", arbitrary order
    order = data.draw(st.permutations(events))
    n_batches = data.draw(st.integers(min_value=1, max_value=5))
    cuts = sorted(
        data.draw(st.lists(st.integers(0, len(order)), min_size=n_batches - 1,
                           max_size=n_batches - 1))
    )
    batches, prev = [], 0
    for c in cuts + [len(order)]:
        batches.append(order[prev:c])
        prev = c

    state = []
    for batch in batches:
        state.extend([t, t, 1, c] for t, c in batch)
        state = _merge_intervals(state, GAP)
    assert state == _brute(events)


@given(events_strategy)
@settings(max_examples=100, deadline=None)
def test_merge_idempotent(events):
    once = _merge_intervals([[t, t, 1, c] for t, c in events], GAP)
    assert _merge_intervals([list(s) for s in once], GAP) == once
