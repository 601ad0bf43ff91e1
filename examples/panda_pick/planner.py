"""Planner server process — the reference's two-process layout
(`/root/reference` `examples/panda_pick/planner.py`): builds the K-sample
MPPI planner and serves it over TCP. Optional here (runtime/loop.py runs the
same task single-process); useful for driving from an external world process
or a real-robot bridge speaking the reference's byte protocol."""
import sys

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
from mppiisaac_tpu.runtime.server import Server
from mppiisaac_tpu.tasks.panda_pick import PandaPickObjective
from mppiisaac_tpu.utils.config_store import load_config
from mppiisaac_tpu.utils.confsys import parse_cli


def main():
    cfg = load_config("tasks/panda_pick", parse_cli(sys.argv[1:]))
    planner = MPPIisaacPlanner(cfg, PandaPickObjective(cfg))
    srv = Server(planner).bind("tcp://0.0.0.0:4242")
    print(f"planner serving on tcp://0.0.0.0:{srv.port}")
    srv.run()


if __name__ == "__main__":
    main()
