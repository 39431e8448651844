"""Generator determinism + planted-structure sanity (FIXTURES.md F1)."""

from dynaalign_ray.fixtures import generate_pages


class TestFixtures:
    def test_deterministic(self):
        p1, t1 = generate_pages(150, seed=5)
        p2, t2 = generate_pages(150, seed=5)
        assert p1.equals(p2) and t1.equals(t2)

    def test_seed_changes_output(self):
        p1, _ = generate_pages(150, seed=5)
        p2, _ = generate_pages(150, seed=6)
        assert not p1.equals(p2)

    def test_structure(self, small_corpus):
        pages, truth = small_corpus
        assert pages.num_rows == truth.num_rows == 400
        urls = pages.column("url").to_pylist()
        assert len(set(urls)) == 400
        channels = set(truth.column("channel").to_pylist())
        assert {"seed", "near", "exact", "boiler", "singleton"} <= channels
        # giant boilerplate cluster ~5%
        boiler = truth.column("channel").to_pylist().count("boiler")
        assert 10 <= boiler <= 40
        langs = set(pages.column("lang").to_pylist())
        assert "en" in langs and len(langs) >= 2
