from nmpc_tpu.io.bridge import Bus, Rate, UdpPublisher, UdpSubscriber, ensure_built  # noqa: F401
from nmpc_tpu.io.robot import RobotBridge  # noqa: F401
