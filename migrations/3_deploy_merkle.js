const MiMC_hash = artifacts.require('MiMC_hash');
const MerkleTree = artifacts.require('MerkleTree');

module.exports = function (deployer) {
  deployer.link(MiMC_hash, MerkleTree);
  deployer.deploy(MerkleTree);
};
