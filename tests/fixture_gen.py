"""Synthetic EuRoC/KITTI mini-fixture generator (the checked-in-fixture idea
of the reference — slam/tests/fixtures/{euroc_mini, kitti_mini} — but
generated deterministically at test time in the documented layouts,
docs/datasets.md:10-66)."""

import os

import numpy as np

FX, FY, CX, CY = 400.0, 400.0, 320.0, 240.0


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def rot_to_quat(r):
    w = np.sqrt(max(0.0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
    x = (r[2, 1] - r[1, 2]) / (4 * w)
    y = (r[0, 2] - r[2, 0]) / (4 * w)
    z = (r[1, 0] - r[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def synth_trajectory(duration=2.0, imu_hz=200, cam_hz=10, speed=1.0,
                     yaw_rate=0.3):
    """Planar arc with constant speed + yaw rate. Returns dict of
    timestamped truth + imu + camera instants."""
    g = np.array([0.0, 0.0, -9.81])
    n_imu = int(duration * imu_hz) + 1
    t = np.arange(n_imu) / imu_hz
    yaw = yaw_rate * t
    # kinematics of constant-speed arc
    if abs(yaw_rate) > 1e-9:
        x = speed / yaw_rate * np.sin(yaw)
        y = speed / yaw_rate * (1 - np.cos(yaw))
    else:
        x, y = speed * t, np.zeros_like(t)
    pos = np.stack([x, y, np.zeros_like(t)], -1)
    vel = np.stack(
        [speed * np.cos(yaw), speed * np.sin(yaw), np.zeros_like(t)], -1
    )
    acc_w = np.stack(
        [-speed * yaw_rate * np.sin(yaw), speed * yaw_rate * np.cos(yaw),
         np.zeros_like(t)], -1
    )
    rots = np.stack([rot_z(a) for a in yaw])
    accel_body = np.einsum("nij,nj->ni", rots.transpose(0, 2, 1), acc_w - g)
    gyro_body = np.tile([0.0, 0.0, yaw_rate], (n_imu, 1))
    ts_ns = (1_000_000_000 + t * 1e9).astype(np.int64)

    cam_every = imu_hz // cam_hz
    cam_idx = np.arange(0, n_imu, cam_every)
    return dict(
        ts_ns=ts_ns, pos=pos, vel=vel, rots=rots,
        accel=accel_body, gyro=gyro_body, cam_idx=cam_idx,
    )


def make_euroc_fixture(root, duration=2.0, n_landmarks=40, seed=0):
    """Write a complete mav0 layout + rust_robotics sidecar; returns truth."""
    traj = synth_trajectory(duration)
    rng = np.random.default_rng(seed)
    mav0 = os.path.join(root, "mav0")
    for sub in ("imu0", "cam0", "state_groundtruth_estimate0", "rust_robotics"):
        os.makedirs(os.path.join(mav0, sub), exist_ok=True)

    with open(os.path.join(mav0, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for k in range(len(traj["ts_ns"])):
            w = traj["gyro"][k]
            a = traj["accel"][k]
            f.write(
                f"{traj['ts_ns'][k]},{w[0]},{w[1]},{w[2]},{a[0]},{a[1]},{a[2]}\n"
            )
    with open(os.path.join(mav0, "imu0", "sensor.yaml"), "w") as f:
        f.write("sensor_type: imu\nT_BS:\n  cols: 4\n  rows: 4\n")
        f.write("  data: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]\n")

    cam_ts = traj["ts_ns"][traj["cam_idx"]]
    with open(os.path.join(mav0, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for t in cam_ts:
            f.write(f"{t},{t}.png\n")
    # camera looks along body +x: camera z forward = body x
    # T_BS rotation: cam axes (right=−body y, down=−body z, forward=body x)
    r_bs = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    t_bs = np.eye(4)
    t_bs[:3, :3] = r_bs
    with open(os.path.join(mav0, "cam0", "sensor.yaml"), "w") as f:
        f.write("sensor_type: camera\nT_BS:\n  cols: 4\n  rows: 4\n")
        f.write("  data: [" + ", ".join(str(v) for v in t_bs.ravel()) + "]\n")
        f.write("resolution: [640, 480]\ncamera_model: pinhole\n")
        f.write(f"intrinsics: [{FX}, {FY}, {CX}, {CY}]\n")

    with open(
        os.path.join(mav0, "state_groundtruth_estimate0", "data.csv"), "w"
    ) as f:
        f.write("#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z,v_x,v_y,v_z,"
                "b_w_x,b_w_y,b_w_z,b_a_x,b_a_y,b_a_z\n")
        for k in range(0, len(traj["ts_ns"]), 5):
            q = rot_to_quat(traj["rots"][k])
            p = traj["pos"][k]
            v = traj["vel"][k]
            f.write(
                f"{traj['ts_ns'][k]},{p[0]},{p[1]},{p[2]},{q[0]},{q[1]},{q[2]},{q[3]},"
                f"{v[0]},{v[1]},{v[2]},0,0,0,0,0,0\n"
            )

    # landmarks scattered ahead of the trajectory
    landmarks = np.stack(
        [
            rng.uniform(1.0, 8.0, n_landmarks),
            rng.uniform(-4.0, 6.0, n_landmarks),
            rng.uniform(-1.5, 1.5, n_landmarks),
        ],
        -1,
    )
    with open(os.path.join(mav0, "rust_robotics", "landmarks.csv"), "w") as f:
        f.write("#landmark_id,x,y,z\n")
        for i, lm in enumerate(landmarks):
            f.write(f"{i},{lm[0]},{lm[1]},{lm[2]}\n")

    with open(os.path.join(mav0, "rust_robotics", "observations.csv"), "w") as f:
        f.write("#timestamp_ns,landmark_id,u,v\n")
        for ci in traj["cam_idx"]:
            body = np.eye(4)
            body[:3, :3] = traj["rots"][ci]
            body[:3, 3] = traj["pos"][ci]
            cam = body @ t_bs
            inv = np.linalg.inv(cam)
            for i, lm in enumerate(landmarks):
                pc = inv[:3, :3] @ lm + inv[:3, 3]
                if pc[2] < 0.3:
                    continue
                u = FX * pc[0] / pc[2] + CX
                v = FY * pc[1] / pc[2] + CY
                if 0 <= u < 640 and 0 <= v < 480:
                    f.write(f"{traj['ts_ns'][ci]},{i},{u},{v}\n")
    return traj, landmarks, t_bs


def make_kitti_fixture(root, n=12):
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    seq = os.path.join(root, "sequences", "00")
    os.makedirs(seq, exist_ok=True)
    poses = []
    with open(os.path.join(root, "poses", "00.txt"), "w") as f:
        for k in range(n):
            r = rot_z(0.05 * k)
            p = np.array([1.0 * k, 0.1 * k**2 / n, 0.0])
            m = np.concatenate([r, p[:, None]], axis=1)
            poses.append(m)
            f.write(" ".join(str(v) for v in m.ravel()) + "\n")
    with open(os.path.join(seq, "times.txt"), "w") as f:
        for k in range(n):
            f.write(f"{0.1 * k}\n")
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: 700 0 600 0 0 700 180 0 0 0 1 0\n")
        f.write("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    return np.stack(poses)
