"""Config layer: JSON round-trip fidelity (SURVEY.md §2.4 contract)."""
import dataclasses

from building_detection_tpu.core.config import Config, EdgeConfig, TrainConfig


class TestJsonRoundTrip:
    def test_default_round_trips_equal(self, tmp_path):
        cfg = Config()
        path = str(tmp_path / "cfg.json")
        cfg.to_json(path)
        back = Config.from_json(path)
        assert back == cfg

    def test_tuple_fields_stay_tuples_and_hashable(self, tmp_path):
        """JSON turns tuples into lists; from_json must coerce them back so
        the frozen dataclasses remain hashable / usable as cache keys."""
        cfg = Config(
            edge=EdgeConfig(big_areas=(1.0, 2.0, 3.0)),
            train=TrainConfig(class_weights=(0.25, 0.75)),
        )
        path = str(tmp_path / "cfg.json")
        cfg.to_json(path)
        back = Config.from_json(path)
        assert back.edge.big_areas == (1.0, 2.0, 3.0)
        assert isinstance(back.edge.big_areas, tuple)
        assert back.train.class_weights == (0.25, 0.75)
        hash(back)  # would raise on any list-valued field
        assert back == cfg

    def test_partial_json_keeps_defaults(self, tmp_path):
        import json

        path = str(tmp_path / "cfg.json")
        with open(path, "w") as f:
            json.dump({"train": dataclasses.asdict(TrainConfig(batch_size=4))}, f)
        back = Config.from_json(path)
        assert back.train.batch_size == 4
        assert back.tiler == Config().tiler
