"""Model / State / Terrain pytree definitions for the TPU-native physics core.

The ``Model`` is a pytree of device arrays plus static (hashable) metadata.
It is built once by :mod:`opendog_tpu.physics.mjcf` from an MJCF file and then
passed as an argument to the jitted physics functions — one compilation per
model topology, shared across every batched env / solver rollout.

Design notes (TPU-first):
  * All per-body/per-dof quantities are fixed-size stacked arrays so every
    physics function is shape-static and fully ``vmap``-able over an env batch.
  * Tree topology (parents, dof addressing, joint types) is static Python
    metadata: the Featherstone loops unroll at trace time into straight-line
    XLA ops over ``(batch, ...)`` arrays — no dynamic control flow inside jit.
  * Collision geometry is canonicalised to spheres/capsules vs. world
    plane / heightfield / static boxes; this replaces MuJoCo's general mesh
    collider (reference: ``our_robot.xml`` meshes, ``go1.xml`` primitive
    collision classes) with a batch-friendly closed form.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

# Joint type codes (static metadata).
JNT_NONE = 0
JNT_HINGE = 1
JNT_FREE = 2


@struct.dataclass
class Model:
    """Static robot + scene description (pytree; arrays are leaves)."""

    # ---- static metadata (not traced) ----
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)  # movable bodies, excl. world
    ngeom: int = struct.field(pytree_node=False)  # collision geoms
    nsite: int = struct.field(pytree_node=False)
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False)  # per body ('' if none)
    actuator_names: Tuple[str, ...] = struct.field(pytree_node=False)
    site_names: Tuple[str, ...] = struct.field(pytree_node=False)
    key_names: Tuple[str, ...] = struct.field(pytree_node=False)
    body_parent: Tuple[int, ...] = struct.field(pytree_node=False)  # -1 = world
    jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)  # per body
    body_qpos_adr: Tuple[int, ...] = struct.field(pytree_node=False)
    body_dof_adr: Tuple[int, ...] = struct.field(pytree_node=False)
    dof_body: Tuple[int, ...] = struct.field(pytree_node=False)
    site_body: Tuple[int, ...] = struct.field(pytree_node=False)
    foot_body: Tuple[int, ...] = struct.field(pytree_node=False)
    foot_geom: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_body_static: Tuple[int, ...] = struct.field(pytree_node=False)
    timestep: float = struct.field(pytree_node=False)
    has_plane: bool = struct.field(pytree_node=False)
    hfield_nrow: int = struct.field(pytree_node=False)
    hfield_ncol: int = struct.field(pytree_node=False)

    # ---- bodies ----
    body_pos: jax.Array  # (nb, 3) frame offset in parent frame
    body_quat: jax.Array  # (nb, 4)
    body_mass: jax.Array  # (nb,)
    body_com: jax.Array  # (nb, 3) COM in body frame
    body_inertia: jax.Array  # (nb, 3, 3) about COM, body frame

    # ---- joints (one per body; zeros where jnt_type is NONE/FREE) ----
    jnt_axis: jax.Array  # (nb, 3) hinge axis, body frame
    jnt_pos: jax.Array  # (nb, 3) hinge anchor, body frame

    # ---- dofs ----
    dof_armature: jax.Array  # (nv,)
    dof_damping: jax.Array  # (nv,)
    dof_frictionloss: jax.Array  # (nv,)
    dof_limited: jax.Array  # (nv,) 0/1
    dof_range: jax.Array  # (nv, 2)
    ancestor_mask: jax.Array  # (nb, nv) 1.0 if dof j actuates body b's chain

    # ---- actuators (MuJoCo position servos: kp/kv/forcerange,
    #      reference our_robot.xml:11, go1.xml:10) ----
    actuator_dof: jax.Array  # (nu,) int32 dof index
    actuator_qposadr: jax.Array  # (nu,) int32 qpos index
    actuator_kp: jax.Array  # (nu,)
    actuator_kv: jax.Array  # (nu,)
    actuator_ctrlrange: jax.Array  # (nu, 2)
    actuator_forcerange: jax.Array  # (nu, 2)

    # ---- collision geoms (canonical all-spheres set: capsules/cylinders are
    #      replaced by endpoint spheres, the paw plate meshes by 4 corner
    #      spheres — one fully vectorised contact path) ----
    geom_body: jax.Array  # (ng,) int32
    geom_pos: jax.Array  # (ng, 3) sphere center in body frame
    geom_radius: jax.Array  # (ng,)
    geom_friction: jax.Array  # (ng, 3) tangential, torsional, rolling
    geom_stiffness: jax.Array  # (ng,) contact normal spring [N/m]
    geom_damping: jax.Array  # (ng,) contact normal damper [N s/m]

    # ---- static world boxes (obstacles; e.g. jump_scene.xml cube) ----
    wbox_pos: jax.Array  # (nw, 3)
    wbox_size: jax.Array  # (nw, 3) half extents

    # ---- sites ----
    site_pos: jax.Array  # (ns, 3) in body frame

    # ---- keyframes ----
    key_qpos: jax.Array  # (nkey, nq)
    key_ctrl: jax.Array  # (nkey, nu)

    # ---- options ----
    gravity: jax.Array  # (3,)

    # ---- soft-contact / solver parameters (approximate MuJoCo's elliptic
    #      cone + impratio=100 near-rigid behaviour; our_robot.xml:3) ----
    contact_stiffness: jax.Array  # () normal spring [N/m]
    contact_damping: jax.Array  # () normal damper [N s/m]
    friction_smoothing: jax.Array  # () tangential velocity scale [m/s]
    limit_stiffness: jax.Array  # () joint-limit spring [N m/rad]
    limit_damping: jax.Array  # () joint-limit damper
    hfield_size: jax.Array  # (4,) x-radius, y-radius, z-top, z-base

    # ---- optional progressive contact impedance (MuJoCo solimp
    #      semantics, power 1): the penalty force ramps from
    #      dmin * k * pen at touchdown to the full k * pen at
    #      penetration >= width.  The reference go1 foot
    #      (go1.xml:62 solimp="0.015 1 0.023") is soft at touchdown —
    #      the friction limit mu*N ramps with it, reproducing the
    #      oracle's touchdown slip.  None (default) = crisp penalty
    #      (every committed plant/bench behavior unchanged).  Op-graph
    #      engine only; the fused kernel keeps the crisp model. ----
    geom_imp_dmin: Optional[jax.Array] = None   # (ng,)
    geom_imp_width: Optional[jax.Array] = None  # (ng,)

    # ------------------------------------------------------------------
    def key_id(self, name: str) -> int:
        return self.key_names.index(name)

    def body_id(self, name: str) -> int:
        return self.body_names.index(name)

    def joint_id(self, name: str) -> int:
        """Index of the *body* carrying this joint."""
        return self.joint_names.index(name)

    def actuator_id(self, name: str) -> int:
        return self.actuator_names.index(name)

    def site_id(self, name: str) -> int:
        return self.site_names.index(name)

    def joint_qpos_adr(self, name: str) -> int:
        b = self.joint_id(name)
        return self.body_qpos_adr[b]

    def joint_dof_adr(self, name: str) -> int:
        b = self.joint_id(name)
        return self.body_dof_adr[b]


@struct.dataclass
class State:
    """Dynamic simulation state (the only carry of the stepping scan)."""

    qpos: jax.Array  # (nq,)
    qvel: jax.Array  # (nv,)
    time: jax.Array  # ()


@struct.dataclass
class Terrain:
    """Per-env heightfield (regenerated per episode in the terrain task,
    reference ``sim2real/train2.py:203-292``).  Heights in meters on a
    regular grid spanning [-size_x, size_x] x [-size_y, size_y]."""

    height: jax.Array  # (nrow, ncol)

    @staticmethod
    def flat(nrow: int = 2, ncol: int = 2, dtype=jnp.float32) -> "Terrain":
        return Terrain(height=jnp.zeros((nrow, ncol), dtype=dtype))


@struct.dataclass
class Contact:
    """Per-geom ground-contact diagnostics produced by the step function.

    The reference rewards consume per-paw contact forces rotated into the paw
    body frame (``rewards/walk_environment_reward_calc.py:339-370``); we expose
    the same quantities batch-first.
    """

    force_world: jax.Array  # (ng, 3) contact force on body, world frame
    force_body: jax.Array  # (ng, 3) same force in the geom's body frame
    penetration: jax.Array  # (ng,) >0 when touching
    in_contact: jax.Array  # (ng,) bool


@struct.dataclass
class StepInfo:
    """Auxiliary outputs of one physics step (last substep)."""

    contact: Contact
    qfrc_actuator: jax.Array  # (nv,)
    qacc: jax.Array  # (nv,)
    xpos: jax.Array  # (nb, 3) body frame origins, world
    xquat: jax.Array  # (nb, 4)
