"""Run the REAL ROS deployment node end-to-end over the loopback transport.

The reference flew sim2real/sample_factory_ros_node.py against a live
roscore on the LMF2 robot; no ROS distribution exists in this image, so
this demo executes the same node code (sim2real/ros_node.NavPolicyNode —
odometry subscriber, policy inference, TwistStamped publisher, rospy.Rate
loop) over sim2real/ros_loopback.py: a simulated odometry stream goes in
at rate, velocity commands come out at rate, and the whole session is
logged to examples/stored_data/ros_session.log (the committed artifact).

Usage:
    python examples/ros_node_loopback_demo.py \
        [--checkpoint examples/dce_rl_navigation/selected_network/navigation_policy.npz]
        [--seconds 3] [--rate 10] [--out examples/stored_data/ros_session.log]
"""

import argparse
import json
import os
import threading
import time

import numpy as np

from aerial_gym_simulator_tpu.sim2real import ros_loopback


def main():
    ap = argparse.ArgumentParser()
    here = os.path.dirname(os.path.abspath(__file__))
    ap.add_argument("--checkpoint", default=os.path.join(
        here, "dce_rl_navigation", "selected_network",
        "navigation_policy.npz"))
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--rate", type=float, default=10.0)
    ap.add_argument("--rate_scale", type=float, default=1.0,
                    help=">1 runs the rehearsal faster than realtime")
    ap.add_argument("--out", default=os.path.join(here, "stored_data",
                                                  "ros_session.log"))
    args = ap.parse_args()

    bus = ros_loopback.install(rate_scale=args.rate_scale)
    from aerial_gym_simulator_tpu.sim2real.ros_node import NavPolicyNode

    node = NavPolicyNode(args.checkpoint, goal=(5.0, 0.0, 1.5))
    spin_thread = threading.Thread(target=node.spin, daemon=True)
    spin_thread.start()

    # simulated odometry stream: a smooth forward trajectory toward the
    # goal with a gentle climb (what the robot's EKF would publish)
    t0 = time.time()
    period = 1.0 / (args.rate * args.rate_scale)
    n_ticks = int(args.seconds * args.rate)
    log = []
    for k in range(n_ticks):
        t = k / args.rate
        pos = [0.5 * t, 0.05 * np.sin(t), 1.0 + 0.05 * t]
        quat = [0.0, 0.0, np.sin(0.02 * t / 2), np.cos(0.02 * t / 2)]
        linvel = [0.5, 0.05 * np.cos(t), 0.05]
        angvel = [0.0, 0.0, 0.02]
        bus.publish("odometry",
                    ros_loopback.make_odometry(pos, quat, linvel, angvel))
        log.append({"t": round(time.time() - t0, 4), "dir": "in",
                    "topic": "odometry",
                    "pos": [round(v, 3) for v in pos]})
        time.sleep(period)
    time.sleep(2 * period)
    bus.shutdown.set()
    spin_thread.join(timeout=5.0)

    cmds = bus.published.get("cmd_vel", [])
    for ts, msg in cmds:
        log.append({"t": round(ts - t0, 4), "dir": "out", "topic": "cmd_vel",
                    "v": [round(msg.twist.linear.x, 4),
                          round(msg.twist.linear.y, 4),
                          round(msg.twist.linear.z, 4)],
                    "yaw_rate": round(msg.twist.angular.z, 4)})
    log.sort(key=lambda e: e["t"])

    wall = args.seconds / args.rate_scale
    out_rate = len(cmds) / wall if wall > 0 else 0.0
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(json.dumps({
            "session": "NavPolicyNode over ros_loopback",
            "checkpoint": os.path.basename(args.checkpoint),
            "rate_hz_requested": args.rate,
            "rate_scale": args.rate_scale,
            "odometry_msgs_in": n_ticks,
            "cmd_vel_msgs_out": len(cmds),
            "effective_cmd_rate_hz": round(out_rate / args.rate_scale, 2),
            "transport": "in-process loopback (no roscore in this image; "
                         "on a robot the real rospy wins)",
        }) + "\n")
        for e in log:
            f.write(json.dumps(e) + "\n")
    print(f"session log -> {args.out}: {n_ticks} odometry in, "
          f"{len(cmds)} cmd_vel out "
          f"({out_rate / args.rate_scale:.1f} Hz effective)")
    assert len(cmds) >= n_ticks - 3, "node must keep up with the rate"


if __name__ == "__main__":
    main()
