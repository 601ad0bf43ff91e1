"""Point-robot planner server process."""
import sys
sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])
from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
from mppiisaac_tpu.runtime.server import Server
from mppiisaac_tpu.tasks.point_robot import PointRobotObjective
from mppiisaac_tpu.utils.config_store import load_config
from mppiisaac_tpu.utils.confsys import parse_cli

def main():
    cfg = load_config("tasks/point_robot", parse_cli(sys.argv[1:]))
    srv = Server(MPPIisaacPlanner(cfg, PointRobotObjective(cfg))).bind("tcp://0.0.0.0:4242")
    print(f"planner serving on :{srv.port}")
    srv.run()

if __name__ == "__main__":
    main()
