const MiMCpe7 = artifacts.require('MiMCpe7_generated');
const MiMC_hash = artifacts.require('MiMC_hash');

module.exports = function (deployer) {
  deployer.deploy(MiMCpe7).then(function () {
    deployer.link(MiMCpe7, MiMC_hash);
    return deployer.deploy(MiMC_hash);
  });
};
