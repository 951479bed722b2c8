"""Driver-contract hygiene + corpus generator determinism."""

import pyarrow as pa


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as m

    qs = m.queries()
    sqls = m.oracle_sql()
    assert set(sqls).issubset(set(qs))
    # every callable takes one positional arg (sf_dir)
    import inspect

    for name, fn in qs.items():
        params = [
            p for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        assert len(params) == 1, name


def test_corpus_range_generation_matches_full():
    from lighthouse_ray.corpus import gen_rows, gen_rows_range

    full = gen_rows(120)
    a = gen_rows_range(0, 50)
    b = gen_rows_range(50, 120)
    for col in full:
        assert full[col] == a[col] + b[col], col


def test_corpus_is_pure_function_of_index():
    from lighthouse_ray.corpus import gen_rows_range

    x = gen_rows_range(30, 40)
    y = gen_rows_range(30, 40)
    assert x == y
