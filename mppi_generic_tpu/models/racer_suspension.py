"""Full-suspension racer dynamics.

Parity target: reference ``dynamics/racer_suspension/racer_suspension.{cuh,cu}``:
a 14-state rigid body — inertial position (3), attitude quaternion (4,
[w,x,y,z]), inertial velocity (3), body angular rate (3), steering angle (1)
— with four independently modeled wheels (racer_suspension.cu:93-300):

* suspension: spring-damper normal force per wheel against the terrain
  height under the (nominally placed) wheel, clamped at zero on extension
  (f_k = max(0, -k_s (l - l_0) - c_s l_dot), :147-153);
* lateral contact: Stribeck friction mu(v) = clamp(v/v_slip, ±1)·mu
  (:77-92); longitudinal: the linear engine model's propulsion force split
  across wheels and clamped to the friction cone (:199);
* Ackermann steering geometry for the two front wheels (:163-172) and a
  first-order steering actuator (:258-260);
* rigid-body derivative: pdot = v, vdot = R f_B / m + g, qdot = 0.5 q⊗[0,w],
  wdot = J^{-1}((Jw)×w + tau_B) (:236-249).

Integration matches the reference's *device* path — explicit Euler with
quaternion renormalization (racer_suspension.cu:55-75); the reference's host
path adds an implicit-Euler correction on omega (:30-45) that the rollout
kernels never use. The elevation-map query is optional flat-ground, exactly
like the reference (its texture lookup is commented out, :128-136) — pass
``elevation_map`` (a ``MapTexture2D`` of heights) to enable terrain.

The reference contains an obvious typo when accumulating the torque
Jacobian (``f_r_B_i_Jac = R_C_i_to_B = f_r_C_i_Jac``, :215) that is only
consumed by the unused implicit-Euler path; it is not reproduced.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.maps.texture import MapTexture2D
from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.utils import math_utils as mu


def _stribeck_friction(v, mu_s, v_slip):
    """mu(v) = clamp(v/v_slip * mu_s, -mu_s, mu_s) (racer_suspension.cu:77-92)."""
    return jnp.clip(v / v_slip * mu_s, -mu_s, mu_s)


class RacerSuspensionDynamics(Dynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=14)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=2)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=26)

    # chassis (RacerSuspensionParams, racer_suspension.cuh:66-90)
    wheel_radius: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.32))
    mass: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1447.0))
    wheel_base: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.981))
    width: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.5))
    height: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.5))
    gravity: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-9.81))
    k_s: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.full((4,), 14000.0, jnp.float32)
    )
    c_s: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.full((4,), 2000.0, jnp.float32)
    )
    mu: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.65))
    v_slip: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    # throttle model
    c_t: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(3.0))
    c_b: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    c_v: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.2))
    c_0: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    gear_sign: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    # steering model
    steering_constant: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.6)
    )
    steer_command_angle_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(-2.45)
    )
    elevation_map: Optional[MapTexture2D] = None

    @classmethod
    def create(cls, elevation_map=None, control_ranges=None, **kw):
        if control_ranges is None:
            control_ranges = [[-1.0, 1.0], [-1.0, 1.0]]
        base = cls._default_constraints(control_ranges=control_ranges)
        params = {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
        return cls(elevation_map=elevation_map, **base, **params)

    # derived geometry (recalcParams, racer_suspension.cuh:110-124)
    def _l0(self, i):
        return self.wheel_radius + self.mass / 4 * (-self.gravity) / self.k_s[i]

    def _cg_pos(self):
        # cg w.r.t. base link: (wheel_base/2, 0, 0.2)
        return (self.wheel_base / 2, jnp.float32(0.0), jnp.float32(0.2))

    def _wheel_pos(self, i):
        half_w = self.width / 2
        wb = self.wheel_base
        zero = jnp.float32(0.0)
        return [
            (wb, half_w, zero), (wb, -half_w, zero),
            (zero, half_w, zero), (zero, -half_w, zero),
        ][i]

    def _terrain_height(self, px, py):
        if self.elevation_map is None:
            return jnp.zeros_like(px)
        # broadcast-safe bilinear height query (flat normal like the
        # reference's disabled lookup); coordinates stack on the trailing
        # axis so world_to_map's (3,) origin broadcast works in every regime
        return self.elevation_map.query_at_world_pose(
            jnp.stack([px, py, jnp.zeros_like(px)], axis=-1)
        )

    # ------------------------------------------------------------------
    def _derive(self, x, u):
        """Returns (state_der (14,...), aux dict for outputs)."""
        px, py, pz = x[0], x[1], x[2]
        qw, qx, qy, qz = x[3], x[4], x[5], x[6]
        vx, vy, vz = x[7], x[8], x[9]
        wx, wy, wz = x[10], x[11], x[12]
        steer_angle = x[13]

        # body-to-world rotation R from the quaternion (row-major components)
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qw * qz)
        r02 = 2 * (qx * qz + qw * qy)
        r10 = 2 * (qx * qy + qw * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qw * qx)
        r20 = 2 * (qx * qz - qw * qy)
        r21 = 2 * (qy * qz + qw * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)

        def R_mul(a, b, c):  # R @ [a,b,c]
            return (r00 * a + r01 * b + r02 * c,
                    r10 * a + r11 * b + r12 * c,
                    r20 * a + r21 * b + r22 * c)

        def Rt_mul(a, b, c):  # R^T @ [a,b,c]
            return (r00 * a + r10 * b + r20 * c,
                    r01 * a + r11 * b + r21 * c,
                    r02 * a + r12 * b + r22 * c)

        tan_delta = jnp.tan(steer_angle)

        # linear engine model (racer_suspension.cu:108-114)
        vel_bx, _, _ = Rt_mul(vx, vy, vz)
        throttle = jnp.maximum(u[0], 0.0)
        brake = jnp.maximum(-u[0], 0.0)
        acc = (self.c_t * throttle
               - jnp.sign(vel_bx) * self.c_b * brake
               - self.c_v * vel_bx + self.c_0)
        propulsion_force = self.mass * acc

        cgx, cgy, cgz = self._cg_pos()
        fB = [jnp.zeros_like(px)] * 3
        tauB = [jnp.zeros_like(px)] * 3
        wheel_pos_out = []
        wheel_force_out = []

        for i in range(4):
            wpx, wpy, wpz = self._wheel_pos(i)
            bx, by, bz = wpx - cgx, wpy - cgy, wpz - cgz  # wheel wrt cg, body
            rx, ry, rz = R_mul(bx, by, bz)
            # nominal wheel position in inertial frame
            pwx, pwy, pwz = px + rx, py + ry, pz + rz
            h_i = self._terrain_height(pwx, pwy)
            l_i = pwz - h_i
            # wheel-point velocity: v + omega x (R b) in inertial frame
            # (Rdot b = R (w x b) rotated = (R w_b?) — the reference uses
            # Rdot = R skew(omega_body), so Rdot b = R (omega x b))
            ox, oy, oz = (wy * bz - wz * by,
                          wz * bx - wx * bz,
                          wx * by - wy * bx)
            rox, roy, roz = R_mul(ox, oy, oz)
            pdx, pdy, pdz = vx + rox, vy + roy, vz + roz
            h_dot_i = jnp.zeros_like(pdx)  # flat normal (n = e_z)
            l_dot_i = pdz - h_dot_i

            f_k = -self.k_s[i] * (l_i - self._l0(i)) - self.c_s[i] * l_dot_i
            f_k = jnp.maximum(f_k, 0.0)

            # Ackermann per-wheel steering (racer_suspension.cu:163-172)
            # atan via the octant-reduced polynomial (~1e-5 rad): exact
            # jnp.arctan has no Mosaic lowering, and this keeps the model
            # inside the fused Pallas rollout kernel. atan(y/x) =
            # atan2(y*sign(x), |x|) preserves the reference's plain-atan
            # quadrant semantics when the Ackermann denominator goes
            # negative at extreme steer angles (racer_suspension.cu:163-172)
            if i == 0:  # front left
                den = self.wheel_base - tan_delta * self.width / 2
                delta = mu.atan2_approx(
                    self.wheel_base * tan_delta * mu.sign(den), jnp.abs(den)
                )
            elif i == 1:  # front right
                den = self.wheel_base + tan_delta * self.width / 2
                delta = mu.atan2_approx(
                    self.wheel_base * tan_delta * mu.sign(den), jnp.abs(den)
                )
            else:
                delta = jnp.zeros_like(tan_delta)

            # contact frame in body coords: n_B = R^T e_z; t, s from wheel dir
            nbx, nby, nbz = Rt_mul(
                jnp.zeros_like(px), jnp.zeros_like(px), jnp.ones_like(px)
            )
            wdx, wdy = jnp.cos(delta), jnp.sin(delta)
            # s = n x wheel_dir (normalized)
            sx = nby * 0.0 - nbz * wdy
            sy = nbz * wdx - nbx * 0.0
            sz = nbx * wdy - nby * wdx
            s_norm = jnp.sqrt(sx * sx + sy * sy + sz * sz) + 1e-9
            sx, sy, sz = sx / s_norm, sy / s_norm, sz / s_norm
            # t = s x n
            tx = sy * nbz - sz * nby
            ty = sz * nbx - sx * nbz
            tz = sx * nby - sy * nbx

            # contact-point velocity in body frame (only the lateral
            # component feeds the force model; the longitudinal force is the
            # clamped propulsion split, racer_suspension.cu:199)
            cvx, cvy, cvz = Rt_mul(pdx, pdy, h_dot_i)
            v_w_s = sx * cvx + sy * cvy + sz * cvz

            f_n = f_k
            mu_s = _stribeck_friction(v_w_s, self.mu, self.v_slip)
            f_s = -mu_s * f_n
            f_t = jnp.clip(propulsion_force / 4, -self.mu * f_n, self.mu * f_n)

            # rotate contact force into the body frame: f_B = [t s n] @ f_C
            fbx = tx * f_t + sx * f_s + nbx * f_n
            fby = ty * f_t + sy * f_s + nby * f_n
            fbz = tz * f_t + sz * f_s + nbz * f_n

            # contact point wrt cg in body coords
            pcx, pcy, pcz = Rt_mul(pwx - px, pwy - py, h_i - pz)
            fB = [fB[0] + fbx, fB[1] + fby, fB[2] + fbz]
            tauB = [
                tauB[0] + pcy * fbz - pcz * fby,
                tauB[1] + pcz * fbx - pcx * fbz,
                tauB[2] + pcx * fby - pcy * fbx,
            ]
            wheel_pos_out.extend([pwx, pwy])
            wheel_force_out.append(
                jnp.sqrt(fbx * fbx + fby * fby + fbz * fbz)
            )

        # rigid-body derivative (racer_suspension.cu:236-249)
        fwx, fwy, fwz = R_mul(*fB)
        vdx = fwx / self.mass
        vdy = fwy / self.mass
        vdz = fwz / self.mass + self.gravity
        # qdot = 0.5 q ⊗ [0, omega]
        qdw = 0.5 * (-qx * wx - qy * wy - qz * wz)
        qdx = 0.5 * (qw * wx + qy * wz - qz * wy)
        qdy = 0.5 * (qw * wy - qx * wz + qz * wx)
        qdz = 0.5 * (qw * wz + qx * wy - qy * wx)
        Jxx = self.mass / 12 * (self.height**2 + self.width**2)
        Jyy = self.mass / 12 * (self.height**2 + self.wheel_base**2)
        Jzz = self.mass / 12 * (self.wheel_base**2 + self.width**2)
        # wdot = J^{-1} ((J w) x w + tau)
        jw_x, jw_y, jw_z = Jxx * wx, Jyy * wy, Jzz * wz
        wdx_ = (jw_y * wz - jw_z * wy + tauB[0]) / Jxx
        wdy_ = (jw_z * wx - jw_x * wz + tauB[1]) / Jyy
        wdz_ = (jw_x * wy - jw_y * wx + tauB[2]) / Jzz
        steer = u[1] / self.steer_command_angle_scale
        steer_d = self.steering_constant * (steer - steer_angle)

        xdot = jnp.stack([
            vx, vy, vz,
            qdw, qdx, qdy, qdz,
            vdx, vdy, vdz,
            wdx_, wdy_, wdz_,
            steer_d,
        ])
        aux = dict(
            Rt_mul=Rt_mul, R_mul=R_mul,
            wheel_pos=wheel_pos_out, wheel_force=wheel_force_out,
            steer_rate=steer_d,
        )
        return xdot, aux

    def state_deriv(self, x, u, t=0.0):
        del t
        xdot, _ = self._derive(x, u)
        return xdot

    def update_state(self, x, xdot, dt):
        """Explicit Euler + quaternion renormalization
        (racer_suspension.cu:55-75)."""
        x_next = x + xdot * dt
        q = x_next[3:7]
        norm = jnp.sqrt(jnp.sum(q * q, axis=0)) + 1e-12
        return jnp.concatenate([x_next[:3], q / norm, x_next[7:]], axis=0)

    def state_to_output(self, x):
        """Output layout per OutputIndex (racer_suspension.cuh:36-64).

        The wheel positions/forces require the force computation; ``step``
        assembles them from its own derivation pass — this zero-control
        fallback re-derives (used only by generic helpers)."""
        xdot, aux = self._derive(x, jnp.zeros_like(x[:2]))
        return self._assemble_output(x, xdot, aux)

    def _assemble_output(self, x, xdot, aux):
        px, py, pz = x[0], x[1], x[2]
        qw, qx, qy, qz = x[3], x[4], x[5], x[6]
        vx, vy, vz = x[7], x[8], x[9]
        wx, wy, wz = x[10], x[11], x[12]
        cgx, cgy, cgz = self._cg_pos()

        cvx, cvy, cvz = aux["Rt_mul"](vx, vy, vz)
        # base-link velocity in body frame: v_B + omega x (-cg)
        blx, bly, blz = -cgx, -cgy, -cgz
        bvx = cvx + wy * blz - wz * bly
        bvy = cvy + wz * blx - wx * blz
        bvz = cvz + wx * bly - wy * blx
        rbx, rby, rbz = aux["R_mul"](blx, bly, blz)
        bpx, bpy, bpz = px + rbx, py + rby, pz + rbz

        roll = mu.atan2_approx(2 * (qw * qx + qy * qz),
                               1 - 2 * (qx * qx + qy * qy))
        pitch = mu.asin_approx(2 * (qw * qy - qz * qx))
        yaw = mu.atan2_approx(2 * (qw * qz + qx * qy),
                              1 - 2 * (qy * qy + qz * qz))

        return jnp.stack(
            [bvx, bvy, bvz, bpx, bpy, bpz, yaw, roll, pitch,
             x[13], aux["steer_rate"]]
            + aux["wheel_pos"] + aux["wheel_force"]
            + [xdot[7], xdot[8], wz]
        )

    def step(self, x, u, t, dt):
        """One step with the full output vector — ONE force pass per step:
        the derivative and the output entries come from the same derivation
        at the pre-step state (racer_suspension.cu:31-45)."""
        xdot, aux = self._derive(x, u)
        x_next = self.update_state(x, xdot, dt)
        return x_next, self._assemble_output(x, xdot, aux)

    def get_zero_state(self):
        """Rest at static equilibrium with identity attitude: the spring
        rest length l_0 already contains the gravity deflection
        (racer_suspension.cuh:75-80), so the equilibrium wheel clearance is
        exactly wheel_radius; cg rides cg_z above the axle plane."""
        x = jnp.zeros((self.STATE_DIM,), jnp.float32)
        return x.at[2].set(self.wheel_radius + self._cg_pos()[2]).at[3].set(1.0)
