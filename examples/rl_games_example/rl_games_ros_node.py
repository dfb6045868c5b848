#!/usr/bin/env python3
"""ROS deployment node for rl-games-trained velocity/acceleration policies
(reference examples/rl_games_example/rl_games_ros_node.py).

Subscribes to mavros odometry, packs the reference's 13/15-d state
observation, runs the imported policy (numpy deployment format) and
publishes mavros ``PositionTarget`` setpoints in either command mode:

- ``velocity``: action -> body-frame velocity + yaw-rate setpoint
- ``acceleration``: action -> world-frame acceleration + yaw-rate setpoint

rospy/mavros are optional deploy-time dependencies — the node refuses to
start without them but the module stays importable for tests.

Run:  rosrun <pkg> rl_games_ros_node.py  (after editing WEIGHTS_PATH)
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

try:  # pragma: no cover - ROS only exists on the robot
    import rospy
    from nav_msgs.msg import Odometry
    from mavros_msgs.msg import PositionTarget
    HAVE_ROS = True
except ImportError:
    HAVE_ROS = False

from rl_games_inference import MLP  # noqa: E402
from aerial_gym_simulator_tpu.sim2real.ros_node import quat_to_euler_zyx

COMMAND_MODE = "acceleration"  # "velocity" or "acceleration"

if COMMAND_MODE == "velocity":
    WEIGHTS_PATH = "networks/vel_control_lmf2_direct.pth"
    CLIP_VALUE = 1.0
    VELOCITY_ACTION_MAGNITUDE = 1.0
    YAW_RATE_ACTION_MAGNITUDE = 1.0
    OBS_DIM, ACT_DIM = 13, 4
elif COMMAND_MODE == "acceleration":
    WEIGHTS_PATH = "networks/acc_command_2_multiplier_disturbance.pth"
    CLIP_VALUE = 1.0
    VELOCITY_ACTION_MAGNITUDE = 1.5
    YAW_RATE_ACTION_MAGNITUDE = 0.8
    OBS_DIM, ACT_DIM = 13, 4
else:
    raise ValueError(f"unknown COMMAND_MODE {COMMAND_MODE!r}")


class RLGamesCommandNode:  # pragma: no cover - requires ROS runtime
    """Odometry -> policy -> PositionTarget at the odometry rate."""

    def __init__(self, weights_path: str, goal=(0.0, 0.0, 1.5)):
        self.model = MLP(OBS_DIM, ACT_DIM, weights_path)
        self.goal = np.asarray(goal, np.float32)
        self.odom = None
        rospy.Subscriber("/mavros/local_position/odom", Odometry,
                         self._odom_cb, queue_size=1)
        self.pub = rospy.Publisher("/mavros/setpoint_raw/local",
                                   PositionTarget, queue_size=1)

    def _odom_cb(self, msg):
        self.odom = msg
        self.pub.publish(self._command(self._build_obs(msg)))

    def _build_obs(self, msg) -> np.ndarray:
        p = msg.pose.pose.position
        q = msg.pose.pose.orientation
        v = msg.twist.twist.linear
        w = msg.twist.twist.angular
        pos_err = self.goal - np.array([p.x, p.y, p.z], np.float32)
        return np.concatenate([
            pos_err,
            np.array([q.x, q.y, q.z, q.w], np.float32),
            np.array([v.x, v.y, v.z], np.float32),
            np.array([w.x, w.y, w.z], np.float32),
        ]).astype(np.float32)

    def _command(self, obs: np.ndarray):
        a = np.clip(self.model(obs), -CLIP_VALUE, CLIP_VALUE)
        cmd = PositionTarget()
        cmd.header.stamp = rospy.Time.now()
        cmd.coordinate_frame = PositionTarget.FRAME_LOCAL_NED
        if COMMAND_MODE == "velocity":
            cmd.type_mask = (PositionTarget.IGNORE_PX | PositionTarget.IGNORE_PY
                             | PositionTarget.IGNORE_PZ
                             | PositionTarget.IGNORE_AFX
                             | PositionTarget.IGNORE_AFY
                             | PositionTarget.IGNORE_AFZ
                             | PositionTarget.IGNORE_YAW)
            cmd.velocity.x = float(a[0]) * VELOCITY_ACTION_MAGNITUDE
            cmd.velocity.y = float(a[1]) * VELOCITY_ACTION_MAGNITUDE
            cmd.velocity.z = float(a[2]) * VELOCITY_ACTION_MAGNITUDE
        else:
            cmd.type_mask = (PositionTarget.IGNORE_PX | PositionTarget.IGNORE_PY
                             | PositionTarget.IGNORE_PZ
                             | PositionTarget.IGNORE_VX
                             | PositionTarget.IGNORE_VY
                             | PositionTarget.IGNORE_VZ
                             | PositionTarget.IGNORE_YAW)
            cmd.acceleration_or_force.x = float(a[0]) * VELOCITY_ACTION_MAGNITUDE
            cmd.acceleration_or_force.y = float(a[1]) * VELOCITY_ACTION_MAGNITUDE
            cmd.acceleration_or_force.z = float(a[2]) * VELOCITY_ACTION_MAGNITUDE
        cmd.yaw_rate = float(a[3]) * YAW_RATE_ACTION_MAGNITUDE
        return cmd


def main():  # pragma: no cover - requires ROS runtime
    if not HAVE_ROS:
        raise SystemExit("rospy/mavros not available — deploy-time only")
    rospy.init_node("rl_games_command_node")
    RLGamesCommandNode(WEIGHTS_PATH)
    rospy.spin()


if __name__ == "__main__":
    main()
